"""Bench artifact contract (VERDICT r11 item 1) — the pieces that keep
the round-over-round perf series machine-readable: truncated-tail
recovery, archived-runs medians, and the compact-line size budget.
No Spark session needed.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_recover_from_tail_reconstructs_the_r11_artifact():
    # the committed BENCH_r11.json is the real broken artifact this
    # machinery exists for: parsed null, tail = the END of the line
    path = os.path.join(REPO, "BENCH_r11.json")
    with open(path) as f:
        data = json.load(f)
    assert data.get("parsed") is None  # the r11 defect, preserved
    queries, canaries = bench._recover_from_tail(data["tail"])
    assert canaries == {"canary_cpu": 2.604, "canary_shuffle": 5.274}
    # spot values the r11 verdict hand-parsed from the same tail
    assert queries["b24_corpus_v7"] == 5.58
    assert queries["b30_ppr"] == 3.431
    assert len(queries) >= 30  # the tail holds most of the board
    # scalar fields must not leak in as fake query timings
    for junk in ("value", "sf", "runs_per_query"):
        assert junk not in queries


def test_medians_from_runs_discards_canary_warmups():
    runs = {
        "q1": [3.0, 1.0, 2.0],
        "canary_cpu": [25.0, 9.0, 4.0, 5.0, 4.5],  # 2 warmups discarded
    }
    med = bench._medians_from_runs(runs)
    assert med["q1"] == 2.0
    assert med["canary_cpu"] == 4.5


def test_drift_normalization_prefers_synthetic_basis():
    # with the repo's committed artifacts present, the prior round must
    # resolve (r11 via tail recovery or r12+ compact) and the basis must
    # be the synthetic pair, with the disagreement cross-check emitted
    timings = {"a6_bootstrap": 0.5, "b24_corpus_v7": 5.0}
    canaries = {"canary_cpu": 2.6, "canary_shuffle": 4.3}
    norm = bench._drift_normalization(timings, canaries)
    assert norm["prev_round"] >= 11
    assert norm["canary_drift_basis"] == "synthetic"
    assert "canary_basis_disagreement" in norm
    assert norm["common_n"] >= 1


def test_compact_summary_line_fits_the_driver_tail_window():
    # the final stdout line must stay far inside the ~2000-char capture;
    # rebuild it the way main() does, from a 66-line board
    # include one real overlap key so the common-set fields populate;
    # the rest are novel names (also covers the no-overlap guard path
    # for the remaining 65)
    timings = {f"b{i}_long_query_name_{i}": 1.234 for i in range(65)}
    timings["b24_corpus_v7"] = 6.454
    canaries = {"canary_cpu": 2.672, "canary_shuffle": 4.266}
    norm = bench._drift_normalization(timings, canaries)
    norm.pop("canary_ratios", None)
    line = json.dumps(
        {
            "metric": "headline_query_wall_total",
            "value": 95.708,
            "unit": "sec",
            "n_queries": len(timings),
            "canaries": canaries,
            "sf": 0.1,
            "runs_per_query": 3,
            **norm,
        }
    )
    assert len(line) < 1200, len(line)

def test_archived_runs_validation_rejects_stale_medians(tmp_path, monkeypatch):
    # ADVICE r12: when the git-archived BENCH_RUNS.json belongs to a
    # DIFFERENT round than the artifact (separate commits), the expected
    # total/n must reject it instead of silently feeding stale medians
    # into the drift ratios. Point the lookup at a repo-less dir so the
    # only candidate is the working-tree copy we control.
    stale = {"medians": {"q1": 1.0, "q2": 2.0}}
    runs_file = tmp_path / "BENCH_RUNS.json"
    runs_file.write_text(json.dumps(stale))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    # matches: accepted
    ok = bench._queries_from_archived_runs(
        "BENCH_r99.json", expect_total=3.0, expect_n=2
    )
    assert ok == {"q1": 1.0, "q2": 2.0}
    # wrong count: rejected
    assert bench._queries_from_archived_runs(
        "BENCH_r99.json", expect_total=3.0, expect_n=3
    ) == {}
    # wrong total: rejected
    assert bench._queries_from_archived_runs(
        "BENCH_r99.json", expect_total=9.0, expect_n=2
    ) == {}
    # no expectations (legacy caller): accepted as before
    assert bench._queries_from_archived_runs("BENCH_r99.json") == stale[
        "medians"
    ]


def test_compact_line_with_companion_still_fits_tail_window():
    # VERDICT r12 item 7: the companion_run block must not push the
    # compact line past the size budget
    timings = {f"b{i}_long_query_name_{i}": 1.234 for i in range(65)}
    timings["b24_corpus_v7"] = 6.454
    canaries = {"canary_cpu": 2.672, "canary_shuffle": 4.266}
    norm = bench._drift_normalization(timings, canaries)
    norm.pop("canary_ratios", None)
    norm["companion_run"] = {
        "sha": "abcdef0",
        "total": 97.123,
        "common_norm_ratio": 0.923,
    }
    line = json.dumps(
        {
            "metric": "headline_query_wall_total",
            "value": 95.708,
            "unit": "sec",
            "n_queries": len(timings),
            "canaries": canaries,
            "sf": 0.1,
            "runs_per_query": 3,
            **norm,
        }
    )
    assert len(line) < 1200, len(line)


def test_registry_gate_artifact_covers_every_registered_query():
    """REGISTRY_GATE.json (VERDICT r13 item 2) is the machine-readable
    record of the builder's full-registry oracle gate — the mitigation
    for the driver window's ~11-round re-attestation period. It must
    cover EVERY query the entry module registers, at the granularity
    the driver cares about: oracled queries pass bit-exact, rows-only
    queries are recorded as such (never silently absent), and each
    entry names the repo sha its run imported."""
    import __spark_entry__ as entrymod

    path = os.path.join(REPO, "REGISTRY_GATE.json")
    with open(path) as f:
        doc = json.load(f)
    registered = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    gated = set(doc["queries"])
    missing = registered - gated
    assert not missing, f"registry-gate artifact missing {sorted(missing)}"
    # and the converse (ADVICE r14): entries for queries later removed
    # or renamed must be pruned at write time, not linger inflating
    # totals with stale attestations
    stale = gated - registered
    assert not stale, f"registry-gate artifact has stale entries {sorted(stale)}"
    for name in sorted(registered):
        scales = doc["queries"][name]["scales"]
        assert scales, f"{name}: no gate run recorded"
        want = "pass" if name in oracled else "rows_only"
        for sf_label, entry in scales.items():
            assert entry["status"] == want, (
                f"{name}@{sf_label}: status {entry['status']!r}, "
                f"expected {want!r}"
            )
            assert entry["sha"], f"{name}@{sf_label}: no sha recorded"
        # the full-registry gate runs at >= 2 scales round-over-round;
        # requiring one here keeps the test valid mid-accumulation
        assert any(s.startswith("sf") for s in scales)


def test_registry_gate_artifact_sha_is_a_real_commit():
    import subprocess

    path = os.path.join(REPO, "REGISTRY_GATE.json")
    with open(path) as f:
        doc = json.load(f)
    shas = {s["sha"] for q in doc["queries"].values()
            for s in q["scales"].values()}
    shas.add(doc["last_run"]["sha"])
    # a committed artifact must never attest a dirty-tree run: the
    # -dirty marker (ADVICE r14) exists to be caught right here
    dirty = {s for s in shas if s.endswith("-dirty")}
    assert not dirty, f"artifact attests dirty-tree runs: {sorted(dirty)}"
    for sha in sorted(shas):
        r = subprocess.run(
            ["git", "cat-file", "-e", f"{sha}^{{commit}}"],
            cwd=REPO,
            capture_output=True,
        )
        assert r.returncode == 0, f"artifact sha {sha} is not a commit"
