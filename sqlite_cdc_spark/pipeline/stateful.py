"""Stateful per-key event processing — the shared transition kernel
behind the B23 ``applyInPandasWithState`` surface row (r13).

The reference streams ordered per-table change events to consumers
(reference: handlers/handlers.go:24 — ordered at-least-once delivery);
this module is the Spark-side generalization a pipeline builds on that
feed: an arbitrary per-key state machine folded over time-ordered
events, factored so the SAME transition function runs

- batch-side via ``groupBy(key).applyInPandas`` (one chunk per key), and
- stream-side via ``applyInPandasWithState`` (one chunk per key per
  micro-batch, state carried in ``GroupState``),

with a stream-equals-batch parity test proving the fold is
chunking-invariant (``tests/test_streaming.py``).

The shipped machine is the browse-funnel DFA a clickstream pipeline
runs: per user, over events in (ts, event_id) order — browse events
(click/view) build a streak, ANY other type breaks it, and a purchase
immediately preceded by a browse event counts as a conversion. All
counters are integers, the fold is deterministic, and the SQL oracle
replays it with lag + gaps-and-islands windows bit-for-bit.

State tuple: ``(n_events, n_purchases, n_conversions,
max_browse_streak, open_streak, last_was_browse)`` — bounded O(1) per
key, so streaming state is |users|, never |events|.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: event types that build a browse streak; anything else breaks it
BROWSE_TYPES = ("click", "view")

#: output schema shared by the batch row and the streaming leg
BROWSE_FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_purchases", T.LongType(), False),
        T.StructField("n_conversions", T.LongType(), False),
        T.StructField("max_browse_streak", T.LongType(), False),
        T.StructField("open_streak", T.LongType(), False),
    ]
)


def init_state() -> tuple:
    return (0, 0, 0, 0, 0, False)


def fold_chunk(state: tuple, etypes) -> tuple:
    """Fold one TIME-ORDERED chunk of a single key's event types into
    the state tuple. Chunking-invariant by construction: the boundary
    facts a run/adjacency read needs (trailing streak length, whether
    the last event was browse) live in the state, so folding chunk A
    then chunk B equals folding A+B — the property the streaming
    parity test asserts. Vectorized (numpy run algebra, the audio_vad
    recipe); no per-event Python loop."""
    import numpy as np

    n_ev, n_pu, n_cv, mx, open_, last_browse = state
    et = np.asarray(etypes, dtype=object)
    n = int(et.size)
    if n == 0:
        return state
    browse = np.isin(et, BROWSE_TYPES)
    purch = et == "purchase"
    prev_browse = np.empty(n, dtype=bool)
    prev_browse[0] = last_browse
    prev_browse[1:] = browse[:-1]
    n_cv += int((purch & prev_browse).sum())
    n_pu += int(purch.sum())
    n_ev += n
    if browse.all():
        open_ += n
        mx = max(mx, open_)
    else:
        idx = np.arange(n)
        nb = idx[~browse]
        first_run = int(nb[0])
        # interior + trailing runs: gaps between consecutive breaks
        runs = np.diff(np.concatenate((nb, [n]))) - 1
        mx = max(mx, open_ + first_run, int(runs.max()))
        open_ = int(n - 1 - nb[-1])
    return (n_ev, n_pu, n_cv, mx, open_, bool(browse[-1]))


def browse_funnel_batch(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Batch side: one ``applyInPandas`` chunk per key, sorted by the
    event-time order inside the UDF (each key's rows arrive as ONE
    pandas frame). Grouped-map shuffles by key; per-key work is the
    vectorized fold — O(events of that key)."""
    import pandas as pd

    cols = [key_col, type_col, *order_cols]

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        s = fold_chunk(init_state(), pdf[type_col].to_numpy(dtype=object))
        return pd.DataFrame(
            {
                "user_id": [int(pdf[key_col].iloc[0])],
                "n_events": [s[0]],
                "n_purchases": [s[1]],
                "n_conversions": [s[2]],
                "max_browse_streak": [s[3]],
                "open_streak": [s[4]],
            }
        )

    return (
        df.select(*cols)
        .groupBy(key_col)
        .applyInPandas(run, BROWSE_FUNNEL_SCHEMA)
    )


def browse_funnel_stateful_update(
    key: tuple,
    pdfs: Iterator,
    state,
):
    """Stream side: the ``applyInPandasWithState`` update function.
    Concatenates the micro-batch's frames for this key, sorts them by
    event order WITHIN the batch (cross-batch order is the source's
    responsibility — a time-partitioned feed like the reference's
    ordered log drain delivers it), folds them into the carried state,
    and emits the current per-key summary. State is the O(1) tuple."""
    import pandas as pd

    s = state.get if state.exists else init_state()
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        s = fold_chunk(s, pdf["event_type"].to_numpy(dtype=object))
    state.update(s)
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_events": [s[0]],
            "n_purchases": [s[1]],
            "n_conversions": [s[2]],
            "max_browse_streak": [s[3]],
            "open_streak": [s[4]],
        }
    )


#: GroupState schema for the streaming leg (last_was_browse as int 0/1 —
#: the state row round-trips through Arrow)
BROWSE_FUNNEL_STATE_SCHEMA = (
    "n_events long, n_purchases long, n_conversions long, "
    "max_browse_streak long, open_streak long, last_was_browse boolean"
)
