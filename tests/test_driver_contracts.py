"""The two driver contracts (CLAUDE.md): ``bench.py`` must print ONE
JSON line and ``__graft_entry__`` must expose a jittable ``entry()``.

The multichip half of the graft contract already runs live in
tests/test_multichip.py (dryrun_multichip on the 8-device CPU mesh);
bench.py had NO coverage — a regression there silently zeroes the
round's recorded benchmark.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parents[1]


def test_bench_prints_one_json_line():
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update({"JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
                # the contract is the OUTPUT FORMAT; one short round
                # suffices — don't pay the full 30s off-TPU budget on
                # every suite run
                "PEMP_BENCH_OFF_TPU_BUDGET_S": "1"})
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    doc = json.loads(lines[0])
    assert set(doc) >= {"metric", "value", "unit", "vs_baseline"}
    assert doc["unit"] == "episodes/s"
    assert doc["value"] > 0


def test_graft_entry_is_jittable():
    import jax

    sys.path.insert(0, str(ROOT))
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 5 and out.shape[-1] == 2   # [B,Q,h,w,2] logits


def test_bench_watchdog_fires_on_wedge_and_stays_silent_on_progress():
    """The watchdog is a NO-PROGRESS bound: a simulated wedge (the
    PEMP_BENCH_FAKE_WEDGE_S hook sleeps before any launch completes)
    must produce exactly ONE WATCHDOG-tagged zero line and exit 3 —
    the driver's one-JSON-line contract survives a dead link."""
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update({"JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
                "PEMP_BENCH_WATCHDOG_S": "1",
                "PEMP_BENCH_FAKE_WEDGE_S": "120"})
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 3, (out.returncode, out.stdout, out.stderr[-500:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    doc = json.loads(lines[0])
    assert "WATCHDOG" in doc["metric"] and doc["value"] == 0.0


def _supervisor_env(**extra):
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update({"JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
                "PEMP_BENCH_OFF_TPU_BUDGET_S": "1",
                # fail fast on regression instead of after the 2700s
                # production budget (ADVICE r3)
                "PEMP_BENCH_SUPERVISOR_TOTAL_S": "300"})
    env.update(extra)
    return env


@pytest.mark.slow
def test_bench_supervisor_recovers_from_one_shot_wedge(tmp_path):
    """A wedged launch wedges the in-process jax runtime permanently, so
    the supervisor retries the measurement in a FRESH child process: the
    first child wedges (watchdog exit 3), the retry measures for real,
    and stdout still carries exactly ONE JSON line — the healthy one.

    PEMP_BENCH_WATCHDOG_S must NOT be set here: a user-set watchdog is
    inherited by the retry children, whose first progress only comes
    after imports + jit compile (~20s on a loaded host) — a 1s bound
    could never pass. The wedging child takes its own short private
    bound via the wedge-once hook (bench.py)."""
    env = _supervisor_env(
        PEMP_BENCH_FAKE_WEDGE_ONCE_FILE=str(tmp_path / "wedge"))
    # Popen + killpg rather than subprocess.run: on timeout, run() would
    # SIGKILL only the supervisor and orphan its measurement child (a
    # real leak observed on a heavily loaded host)
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True)
    try:
        stdout, stderr = proc.communicate(timeout=360)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, 9)
    assert proc.returncode == 0, (proc.returncode, stdout, stderr[-2000:])
    assert "attempt 1 wedged" in stderr
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {stdout!r}"
    doc = json.loads(lines[0])
    assert "WATCHDOG" not in doc["metric"] and doc["value"] > 0


def test_bench_supervisor_budget_exhausted_relays_watchdog_line(tmp_path):
    """With no retry budget left, the supervisor relays the child's
    watchdog zero line and exit code — the old dead-link contract."""
    env = _supervisor_env(
        PEMP_BENCH_SUPERVISOR_TOTAL_S="0",
        PEMP_BENCH_FAKE_WEDGE_ONCE_FILE=str(tmp_path / "wedge"))
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 3, (out.returncode, out.stdout, out.stderr[-500:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    doc = json.loads(lines[0])
    assert "WATCHDOG" in doc["metric"] and doc["value"] == 0.0


@pytest.mark.slow
def test_bench_supervisor_retries_silent_crash(tmp_path):
    """A child that dies without emitting anything (segfault/OOM/killed)
    breaks the contract exactly like a wedge — the supervisor retries it
    in a fresh process and relays the healthy line (ADVICE r3)."""
    env = _supervisor_env(
        PEMP_BENCH_FAKE_CRASH_ONCE_FILE=str(tmp_path / "crash"))
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True)
    try:
        stdout, stderr = proc.communicate(timeout=360)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, 9)
    assert proc.returncode == 0, (proc.returncode, stdout, stderr[-2000:])
    assert "died rc=7" in stderr
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {stdout!r}"
    doc = json.loads(lines[0])
    assert doc["value"] > 0


def test_bench_supervisor_emits_contract_line_when_children_never_do(tmp_path):
    """Persistent silent crashes exhaust the bounded crash retries; the
    SUPERVISOR then emits the zero contract line itself instead of
    relaying empty stdout (ADVICE r3)."""
    env = _supervisor_env(PEMP_BENCH_FAKE_CRASH="1")
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 3, (out.returncode, out.stdout, out.stderr[-500:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    doc = json.loads(lines[0])
    assert "SUPERVISOR" in doc["metric"] and doc["value"] == 0.0
