"""Guards for the benchmark tooling's variant grammar.

The anatomy numbers in docs/DESIGN.md §5b/5d/5e are only comparable if
composable tokens ("int8", "remat[stages]", the "swin_" workload prefix)
never change what the equality-matched sub-variant measures.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from step_anatomy import parse_variant  # noqa: E402


@pytest.mark.parametrize("variant,want", [
    ("full", (False, "full", None)),
    ("bf16", (False, "bf16", None)),
    ("fp", (False, "fp", None)),
    ("int8_bf16", (False, "bf16", None)),
    ("int8_noteacher", (False, "noteacher", None)),
    ("swin_bf16", (True, "bf16", None)),
    ("swin_fp", (True, "fp", None)),
    ("swin_int8_bf16", (True, "bf16", None)),
    # remat composes like int8: the sub-variant survives the token
    ("swin_fwd_remat", (True, "fwd", (0, 1))),
    ("swin_noteacher_remat", (True, "noteacher", (0, 1))),
    ("swin_remat_int8", (True, "full", (0, 1))),
    ("swin_bf16_remat0", (True, "bf16", (0,))),
    ("swin_bf16_remat01", (True, "bf16", (0, 1))),
])
def test_parse_variant(variant, want):
    assert parse_variant(variant) == want


def test_deit_remat_token_rejected():
    """A remat token on a non-Swin variant must fail loudly: build() only
    applies remat_stages through SwinConfig, so silently accepting it
    would commit a plain-step measurement under a remat label."""
    from step_anatomy import build

    with pytest.raises(ValueError, match="Swin-only"):
        build("bf16_remat", batch=4)


def test_lsq_drift_helper_is_shared():
    """bf16_study and bf16_seed_control must measure the SAME scale set:
    both import the one walk/drift definition from lsq_drift."""
    import numpy as np

    import bf16_seed_control
    import lsq_drift

    assert bf16_seed_control.drift is lsq_drift.drift_stats
    tree_a = {"blk": {"input_quant": {"s": np.array([1.0, 2.0])},
                      "kernel": np.array([3.0])},
              "quan_qkx": {"s": np.array([4.0])}}
    tree_b = {"blk": {"input_quant": {"s": np.array([1.1, 2.0])},
                      "kernel": np.array([9.0])},
              "quan_qkx": {"s": np.array([4.0])}}
    stats = lsq_drift.drift_stats(tree_a, tree_b)
    # only the 3 quantizer scales counted (kernel excluded)
    assert stats["n"] == 3
    assert abs(stats["median"]) < 1e-12  # two of three entries unchanged


def test_wait_for_backend_probes_cpu():
    """The bench backend probe must succeed quickly on a healthy backend
    (the failure path was exercised live against a hung tunnel: exit 3)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    assert bench.wait_for_backend(attempts=1, probe_timeout=120) == "cpu"


def test_measure_reports_spread(monkeypatch):
    """bench.measure returns best/median/worst of the timed rounds
    (verdict r3 weak #4: the artifact must carry its own variance
    bound), and _rate unwraps the best."""
    import numpy as np

    import bench

    def fake_build(matmul_impl=None, compute_dtype=None, batch=4, model=""):
        def step(state, batch_d, key, tparams):
            return state, {"loss": np.float32(1.0)}
        return step, {}, {"image": 0}, None

    monkeypatch.setattr(bench, "build", fake_build)
    r = bench.measure(iters=2, batch=4, rounds=3)
    assert set(r) == {"best", "median", "worst", "rounds", "iters"}
    assert r["worst"] <= r["median"] <= r["best"]
    assert bench._rate(iters=1, batch=4, rounds=1) > 0
    # even round count: median must be the true median (mean of the two
    # middle rates), not the upper-middle element (== best at rounds=2)
    monkeypatch.setattr(bench.time, "perf_counter",
                        _FakeClock(step_s=[1.0, 2.0]))
    r2 = bench.measure(iters=1, batch=4, rounds=2)
    assert r2["worst"] < r2["median"] < r2["best"]
    assert abs(r2["median"] - (r2["best"] + r2["worst"]) / 2) < 1e-9


class _FakeClock:
    """perf_counter stub: k-th timed round takes step_s[k] seconds."""

    def __init__(self, step_s):
        self._step_s = list(step_s)
        self._t = 0.0
        self._starts = 0

    def __call__(self):
        # measure() calls perf_counter twice per round (start, end)
        if self._starts % 2 == 1:
            self._t += self._step_s.pop(0)
        self._starts += 1
        return self._t


def test_bf16_study_rejects_class_count_mismatch(tmp_path, monkeypatch):
    """The dataset on disk is ground truth: --num-classes disagreeing with
    the class dirs in --data/train must abort before any training (round-4
    review: --level easy generates 3 classes while the default
    --num-classes is 6)."""
    import bf16_study

    data = tmp_path / "data"
    for split in ("train", "validation"):
        for cls in ("circle", "square", "triangle"):
            (data / split / cls).mkdir(parents=True)
    monkeypatch.setattr(sys, "argv", [
        "bf16_study.py", "--out", str(tmp_path / "out"),
        "--data", str(data), "--num-classes", "6"])
    with pytest.raises(SystemExit, match="3 classes"):
        bf16_study.main()


def test_bf16_study_report_no_data_verdict(tmp_path, monkeypatch):
    """Zero complete seed pairs must yield an explicit NO-DATA verdict,
    not a NaN-laden FAIL (np.mean([]) -> nan, json.dump writes a
    non-parseable NaN token)."""
    import json

    import bf16_study_report

    study = {"config": {"seeds": 2}, "runs": {"seed0_float32": {}},
             "compare": {}}
    with open(tmp_path / "bf16_study.json", "w") as f:
        json.dump(study, f)
    monkeypatch.setattr(sys, "argv", [
        "bf16_study_report.py", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):
        bf16_study_report.main()
    with open(tmp_path / "bf16_study_report.json") as f:
        report = json.load(f)  # parseable: no bare NaN tokens
    assert report["summary"]["acceptance"] == "NO-DATA"
    assert report["n_seed_pairs"] == 0


def test_serving_latency_paths_agree():
    """benchmarks/serving_latency.py must measure the REAL serving paths:
    all three (qat_eval / frozen_fp / int_core) build from one param set
    through the actual export_packed->restore_packed machinery and
    predict the same classes — otherwise a rate labeled 'int_core' could
    silently time a broken or fp path."""
    import numpy as np

    import serving_latency

    preds = serving_latency.make_predictors(
        None, ["qat_eval", "frozen_fp", "int_core"],
        variant="deit_test_distilled")
    assert set(preds) == {"qat_eval", "frozen_fp", "int_core"}
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    outs = {}
    for name, (model, params) in preds.items():
        logits, _ = model.apply(params, x, train=False)
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["qat_eval"], outs["frozen_fp"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(outs["frozen_fp"], outs["int_core"],
                               rtol=2e-4, atol=2e-4)

    r = serving_latency.time_path(*preds["int_core"], batch=2, iters=1)
    assert r["imgs_per_sec"] > 0 and r["latency_ms"] > 0
    assert r["rate_spread"][0] <= r["imgs_per_sec"] <= r["rate_spread"][1]


def test_cga_ab_report_partial_seeds():
    """The report tool must summarize partial studies (a tunnel outage or
    round boundary must not strand finished seeds) and skip arms that
    haven't finished."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from cga_ab_report import summarize

    data = {
        "config": {"boundary_ranges": [0.005]},
        "runs": {
            "seed0": {"top1_fp": 45.0, "top1_qat": 57.0,
                      "top1_cga_br0.005": 58.4, "top1_nofreeze": 57.9},
            "seed1": {"top1_fp": 44.0, "top1_qat": 56.0,
                      "top1_cga_br0.005": 56.2, "top1_nofreeze": 56.4},
            "seed2": {"top1_fp": 43.0},  # mid-flight: no control arm yet
        },
        "frozen_fraction": {"seed0": {"0.005": 0.992}},
    }
    s = summarize(data)
    assert s["seeds_completed"] == ["seed0", "seed1"]
    assert s["n_seeds"] == 2
    d = s["delta_br0.005"]
    assert d["per_seed"] == {"seed0": 0.5, "seed1": -0.2}
    assert abs(d["mean"] - 0.15) < 1e-9
    assert s["control_seed_sigma"] is not None

    # single completed seed: sigma undefined, mean still reported
    one = summarize({"config": {"boundary_ranges": [0.005]},
                     "runs": {"seed0": data["runs"]["seed0"]}})
    assert one["control_seed_sigma"] is None
    assert one["delta_br0.005"]["mean"] == 0.5


def test_bench_main_json_contract(monkeypatch, capsys):
    """End-to-end main() with measurement stubbed: the driver-facing JSON
    must carry the round-5 keys (value_median, vs_baseline_median,
    per-family vs_baseline) and never crash assembling them."""
    import json as _json

    import bench

    fake = {"best": 1000.0, "median": 990.0, "worst": 900.0,
            "rounds": 3, "iters": 10}
    monkeypatch.setattr(bench, "measure", lambda *a, **k: dict(fake))
    monkeypatch.setattr(bench, "serving_rate", lambda **k: 5000.0)
    monkeypatch.setattr(bench, "wait_for_backend", lambda **k: "cpu")
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    d = _json.loads(line)
    assert d["value_median"] <= d["value"]
    assert abs(d["vs_baseline"] - 1000.0 / bench.A100_ESTIMATE_IMGS_PER_SEC) < 1e-3
    assert abs(d["vs_baseline_median"] - 990.0 / bench.A100_ESTIMATE_IMGS_PER_SEC) < 1e-3
    sec = d["secondary"]
    for fam in ("swin_t", "deit_b"):
        assert abs(sec[f"{fam}_vs_baseline"]
                   - 1000.0 / bench.A100_FAMILY_IMGS_PER_SEC[fam]) < 1e-2
        assert f"{fam}_mfu" in sec
