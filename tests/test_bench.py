"""bench.py supervisor contract (VERDICT r2 item 1).

The driver runs `python bench.py` and parses the last stdout line as JSON.
Round 2's capture failed rc=1 with a stack trace when the TPU relay was
down; the supervisor now guarantees rc=0 and a JSON line in every outcome:
success passthrough, child crash, and child hang (relay connect loop).
Reference workload being benchmarked: /root/reference/KeyDataset.py:490-494
front-end + /root/reference/models.py forward.
"""

import json
import os
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "bench.py")


def _run(child_code, **env_over):
    # empty pool-IPs skips the axon site-hook's TPU plugin registration in
    # the child: without it, bare `python -c` startup imports the plugin
    # (seconds under load) and can eat a short retry budget before the
    # child code even runs
    env = dict(os.environ, AKX_BENCH_TEST_CHILD=child_code,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu", **env_over)
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          timeout=120)
    lines = proc.stdout.decode().strip().splitlines()
    return proc.returncode, json.loads(lines[-1])


def test_success_passthrough():
    rc, out = _run('print(\'{"metric": "audio_min_per_sec_per_chip", '
                   '"value": 42.5, "vs_baseline": 3.0}\')')
    assert rc == 0
    assert out["value"] == 42.5
    assert "error" not in out


def test_child_crash_emits_json_rc0():
    rc, out = _run("import sys; sys.exit(3)",
                   AKX_BENCH_MAX_ATTEMPTS="2", AKX_BENCH_RETRY_BUDGET_S="60",
                   AKX_BENCH_BACKOFF_S="0.2")
    assert rc == 0
    assert out["metric"] == "audio_min_per_sec_per_chip"
    assert out["value"] == 0.0
    assert "rc=3" in out["error"]


def test_child_hang_times_out_emits_json_rc0():
    rc, out = _run("import time; time.sleep(60)",
                   AKX_BENCH_MAX_ATTEMPTS="1",
                   AKX_BENCH_ATTEMPT_TIMEOUT_S="2")
    assert rc == 0
    assert out["value"] == 0.0
    assert "timed out" in out["error"]


def test_zero_value_inner_json_is_retried(tmp_path):
    """An inner bench that emits its own value-0.0 failure JSON (every
    front-end raised mid-run) is a FAILED attempt: the supervisor retries
    instead of passing the zero through as a result."""
    marker = tmp_path / "attempt1"
    code = (f"import os, sys\n"
            f"p = {str(marker)!r}\n"
            f"if not os.path.exists(p):\n"
            f"    open(p, 'w').close()\n"
            f"    print('{{\"metric\": \"audio_min_per_sec_per_chip\", "
            f"\"value\": 0.0, \"vs_baseline\": 0.0}}')\n"
            f"    sys.exit(0)\n"
            f"print('{{\"metric\": \"audio_min_per_sec_per_chip\", "
            f"\"value\": 9.0}}')\n")
    rc, out = _run(code, AKX_BENCH_MAX_ATTEMPTS="3",
                   AKX_BENCH_RETRY_BUDGET_S="90", AKX_BENCH_BACKOFF_S="0.2")
    assert rc == 0
    assert out["value"] == 9.0


def test_hang_kills_child_process_group(tmp_path):
    """On attempt timeout the supervisor SIGKILLs the child's whole process
    group, so helpers the inner bench spawned (e.g. binding.py's `make`)
    cannot survive to poison later attempts."""
    pidfile = tmp_path / "grandchild.pid"
    code = (f"import subprocess, time\n"
            f"p = subprocess.Popen(['sleep', '600'])\n"
            f"open({str(pidfile)!r}, 'w').write(str(p.pid))\n"
            f"time.sleep(600)\n")
    rc, out = _run(code, AKX_BENCH_MAX_ATTEMPTS="1",
                   AKX_BENCH_ATTEMPT_TIMEOUT_S="3")
    assert rc == 0 and out["value"] == 0.0
    gpid = int(pidfile.read_text())

    def _gone(pid):
        try:  # dead-or-zombie counts as killed (init reaps zombies async)
            with open(f"/proc/{pid}/stat") as f:
                return f.read().split(")")[-1].split()[0] == "Z"
        except OSError:
            return True

    deadline = time.time() + 5
    while not _gone(gpid) and time.time() < deadline:
        time.sleep(0.2)
    assert _gone(gpid), "grandchild survived the process-group kill"


def test_timeout_salvages_partial_result():
    """The inner bench re-emits its full JSON report after every
    measurement; if every attempt times out, the supervisor salvages the
    best-so-far line from the killed child's stdout (flagged partial)
    instead of reporting an undiagnosable zero (VERDICT r3 item 1)."""
    code = ("import time\n"
            "print('{\"metric\": \"audio_min_per_sec_per_chip\", "
            "\"value\": 11.5, \"fronts\": {\"pallas\": {}}}', flush=True)\n"
            "time.sleep(600)\n")
    rc, out = _run(code, AKX_BENCH_MAX_ATTEMPTS="1",
                   AKX_BENCH_ATTEMPT_TIMEOUT_S="3")
    assert rc == 0
    assert out["value"] == 11.5
    assert out["partial"] is True
    assert "timed out" in out["error"]
    assert "pallas" in out["fronts"]


def test_retries_then_succeeds(tmp_path):
    """First attempt crashes, second succeeds — supervisor retries."""
    marker = tmp_path / "attempt1"
    code = (f"import os, sys\n"
            f"p = {str(marker)!r}\n"
            f"if not os.path.exists(p):\n"
            f"    open(p, 'w').close(); sys.exit(1)\n"
            f"print('{{\"metric\": \"audio_min_per_sec_per_chip\", "
            f"\"value\": 7.0}}')\n")
    rc, out = _run(code, AKX_BENCH_MAX_ATTEMPTS="3",
                   AKX_BENCH_RETRY_BUDGET_S="90", AKX_BENCH_BACKOFF_S="0.2")
    assert rc == 0
    assert out["value"] == 7.0
