"""bench.py fault tolerance (round-2 verdict #1): a transient backend fault
during measurement must not cost the round its official perf artifact.

Runs the real harness in a subprocess with injected FAILED_PRECONDITION
faults (VMMT_BENCH_INJECT_FAULTS) on a tiny CPU model and asserts the final
stdout line still parses as the bench JSON.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=600):
    env = os.environ.copy()
    env.update({
        "JAX_PLATFORMS": "cpu",
        "VMMT_BENCH_TINY": "1",
        "VMMT_BENCH_BACKOFF": "0",
        "VMMT_BENCH_DECODE_REPS": "2",
        # share the test session's persistent cache so retry recompiles
        # (after the backend reset) are near-free
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    env.update(extra_env)
    p = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, f"bench died:\n{p.stderr[-3000:]}"
    json_lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON line in stdout:\n{p.stdout}\n{p.stderr[-2000:]}"
    return json.loads(json_lines[-1]), p.stderr


def test_bench_survives_transient_train_faults():
    # two injected faults -> two backend resets -> third attempt succeeds
    d, stderr = _run_bench({"VMMT_BENCH_INJECT_FAULTS": "2"})
    assert d["metric"] == "train_tokens_per_sec_per_chip"
    assert d["value"] > 0
    assert d["decode_beam4_sent_per_sec"] > 0
    assert len(d["decode_iqr"]) == 2
    assert "transient fault in train" in stderr
    assert "resetting backend" in stderr


def test_bench_decode_failure_emits_null_not_death():
    # every decode drain faults -> decode retries exhaust -> train line still
    # printed with decode fields nulled
    d, stderr = _run_bench({"VMMT_BENCH_INJECT_DECODE_FAULTS": "always"})
    assert d["value"] > 0
    assert d["decode_beam4_sent_per_sec"] is None
    assert d["decode_iqr"] is None
    assert "decode sub-bench failed" in stderr
