"""CPU smoke of the driver-visible benchmark artifact (bench.py).

bench.py is how the round's headline numbers reach the driver; a
regression there silently costs the measurement.  This runs the REAL
script in a subprocess at smoke shapes (env knobs exist exactly for
this) and pins the one-JSON-line contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_with_both_workloads():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        # smoke shapes: keep CPU compile of the full train step tractable
        "BENCH_BATCH": "2",
        "BENCH_PATCH": "32",
        "BENCH_N": "2",
        "BENCH_TRAIN_BATCH": "2",
        "BENCH_TRAIN_N": "2",
        "BENCH_ZOO_BATCH": "2",
        "BENCH_ZOO_N": "2",
        "BENCH_ZOO_TRAIN_BATCH": "2",
        "BENCH_ZOO_TRAIN_N": "2",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    # the driver contract
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "images/sec/chip"
    # magnitudes are meaningless at CPU smoke shapes; vs_baseline rounds
    # to 2 decimals and can print 0.0 when CPU throughput < 2.5 img/s
    assert rec["value"] > 0 and rec["vs_baseline"] >= 0
    # both halves of the workload (VERDICT r2 item 4)
    assert rec["train_patches_per_sec"] > 0
    # slow-tail zoo visibility (VERDICT r3 item 7): one model per
    # archetype + the aggregate min
    assert set(rec["zoo_img_per_sec"]) == {
        "MultiResUNet", "NestedUNet", "BCDU_net_D3"}
    assert rec["zoo_min_img_per_sec"] > 0
    assert rec["zoo_min_img_per_sec"] == min(rec["zoo_img_per_sec"].values())
    # train-side zoo visibility (VERDICT r4 item 5): production train
    # step per archetype, so a train regression reaches BENCH_r*.json
    assert set(rec["zoo_train_patches_per_sec"]) == {
        "MultiResUNet", "NestedUNet", "BCDU_net_D3", "FRUNet"}
    assert rec["zoo_min_train_patches_per_sec"] > 0
    assert rec["zoo_min_train_patches_per_sec"] == min(
        rec["zoo_train_patches_per_sec"].values())
