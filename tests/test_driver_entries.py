"""Driver-entry robustness (round-3 verdict: both driver artifacts died with
the TPU tunnel, one avoidably).

- `__graft_entry__.dryrun_multichip` must force the CPU platform BEFORE any
  `jax.devices()` call: probing the default platform initializes the axon
  backend, and with the tunnel down that call wedges forever (the round-3
  MULTICHIP rc=124).
- `bench.py` must probe backend init in a subprocess with retry/backoff and
  emit a parseable {"error": "tpu_unavailable"} JSON object on final failure,
  never a traceback / rc!=0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_ensure_devices_never_touches_default_platform():
    """With JAX_PLATFORMS pointing at a backend that cannot initialize, any
    device query that consults the default platform raises — so this passes
    only if _ensure_devices selects cpu before its first jax.devices()."""
    env = dict(os.environ, JAX_PLATFORMS="nonexistent_backend")
    env.pop("XLA_FLAGS", None)
    # strip the axon sitecustomize: its register() can wedge the child at
    # interpreter start while the tunnel is half-up, regardless of platform
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or REPO
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g\n"
         "g._ensure_devices(2)\n"
         "import jax\n"
         "ds = jax.devices()\n"
         "assert len(ds) >= 2 and ds[0].platform == 'cpu', ds\n"
         "print('GUARD_OK')\n"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "GUARD_OK" in r.stdout, (
        r.stdout[-1000:], r.stderr[-2000:])


def test_bench_emits_structured_error_when_backend_unavailable(
        monkeypatch, capsys):
    import bench
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    obj = json.loads(out[-1])  # parseable single JSON line, not a traceback
    assert obj["error"] == "tpu_unavailable"
    assert obj["metric"] == "captions_per_sec_per_chip_beam1"
    assert obj["value"] is None and obj["vs_baseline"] is None


def test_probe_backend_retries_then_gives_up(monkeypatch):
    import bench
    calls = {"run": 0, "sleep": []}

    def fake_run(*a, **k):
        calls["run"] += 1
        raise subprocess.TimeoutExpired(cmd="python", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", calls["sleep"].append)
    env = dict(os.environ, JAX_PLATFORMS="cpu")  # single candidate
    assert bench._probe_backend(max_attempts=3, backoff_s=7.0,
                                env=env) is None
    assert calls["run"] == 3
    assert calls["sleep"] == [7.0, 7.0]  # no sleep after the final attempt


def test_probe_backend_parses_platform(monkeypatch):
    import bench

    class R:
        returncode = 0
        stdout = "some plugin warning noise\nPROBE_OK axon\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    assert bench._probe_backend(max_attempts=1) == ("axon", None)


def test_probe_backend_falls_back_to_native_tpu(monkeypatch):
    """Environment drift: JAX_PLATFORMS=axon is preset but the plugin never
    registered (register() failures are swallowed by the sitecustomize), so
    the inherited probe fails FAST while the chip is reachable as the native
    'tpu' PJRT platform.  The probe must try JAX_PLATFORMS=tpu in the same
    attempt and report the value the caller must adopt."""
    import bench
    seen_envs = []

    def fake_run(cmd, env=None, **k):
        seen_envs.append(env.get("JAX_PLATFORMS"))

        class R:
            returncode = 1 if env.get("JAX_PLATFORMS") == "axon" else 0
            stdout = ("" if env.get("JAX_PLATFORMS") == "axon"
                      else "PROBE_OK tpu\n")
            stderr = ("RuntimeError: Unable to initialize backend 'axon': "
                      "Backend 'axon' is not in the list of known backends"
                      if env.get("JAX_PLATFORMS") == "axon" else "")
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    env = dict(os.environ, JAX_PLATFORMS="axon")
    assert bench._probe_backend(max_attempts=1, env=env) == ("tpu", "tpu")
    assert seen_envs == ["axon", "tpu"]


def test_probe_backend_tpu_fallback_dropped_after_wedge(monkeypatch):
    """The tpu-fallback candidate is insurance: if it wedges once it must be
    dropped from later attempts (each wedge costs the full probe timeout),
    while the inherited env keeps retrying (tunnel blips recover)."""
    import bench
    seen = []

    def fake_run(cmd, env=None, **k):
        seen.append(env.get("JAX_PLATFORMS"))
        raise subprocess.TimeoutExpired(cmd="python", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    env = dict(os.environ, JAX_PLATFORMS="axon")
    assert bench._probe_backend(max_attempts=3, env=env) is None
    assert seen == ["axon", "tpu", "axon", "axon"]


def test_bench_wedge_watchdog_armed_and_cancelled(monkeypatch, capsys):
    """A tunnel wedge AFTER the probe parks the main thread in a device call
    forever; bench must arm a plain-Python deadline timer that can still
    emit the JSON line, and cancel it on the normal path."""
    import threading
    import bench
    timers = []

    class SpyTimer(threading.Timer):
        def __init__(self, interval, fn):
            super().__init__(interval, fn)
            self.cancelled = False
            timers.append(self)

        def cancel(self):
            self.cancelled = True
            super().cancel()

    monkeypatch.setattr(threading, "Timer", SpyTimer)  # bench imports the
    # threading module inside main(), so patching the module attr reaches it
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: ("cpu", None))
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 123.0)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(out)
    assert obj["value"] == 123.0 and "error" not in obj
    assert len(timers) == 1 and timers[0].cancelled
    assert timers[0].interval > 600  # fires only past the wall budget


def test_bench_wedge_watchdog_fires(tmp_path):
    """The fire path, end-to-end in a real subprocess: a device call that
    never returns (the mid-run tunnel wedge) must still produce a parseable
    JSON line with an error marker and rc=0 — the watchdog's whole point."""
    code = (
        "import time, sys\n"
        "import bench\n"
        "bench.BUDGET_S = 0.5\n"
        "bench.WATCHDOG_GRACE_S = 1.0\n"
        "bench._probe_backend = lambda *a, **k: ('cpu', None)\n"
        "bench.bench_once = lambda *a, **k: time.sleep(600)\n"
        "sys.argv = ['bench.py', '--fast']\n"
        "bench.main()\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(  # axon-free child (import wedge)
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or REPO
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
    obj = json.loads(r.stdout.strip().splitlines()[-1])
    assert obj["error"] == "tpu_wedged_mid_bench"
    assert obj["value"] is None  # beam1 never finished


def test_bench_progressive_checkpoint_lines(monkeypatch, capsys):
    """bench must print a parseable checkpoint line after every completed
    sub-bench (each a superset, marked partial) with the complete line last,
    so any kill point leaves the driver the numbers measured so far."""
    import bench
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: ("cpu", None))
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 111.0)
    monkeypatch.setattr(bench, "bench_beam", lambda *a, **k: 22.0)
    monkeypatch.setattr(bench, "bench_train", lambda *a, **k: 33.0)
    monkeypatch.setattr(bench, "bench_train_fused", lambda *a, **k: 44.0)
    monkeypatch.setattr(bench, "bench_resnet", lambda *a, **k: 55.0)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(s) for s in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 7  # beam1 + 5 extras (partial) + final
    assert all(obj.get("partial") for obj in lines[:-1])
    final = lines[-1]
    assert "partial" not in final
    assert final["value"] == 111.0
    assert final["beam2_captions_per_sec"] == 22.0
    assert final["beam5_captions_per_sec"] == 22.0
    assert final["train_mle_it_per_s"] == 33.0
    assert final["train_mle_fused_it_per_s"] == 44.0
    assert final["resnet101_images_per_sec"] == 55.0
    # monotone supersets: every key of line i appears in line i+1
    for a, b in zip(lines, lines[1:]):
        assert set(a) - {"partial", "wall_s"} <= set(b)
    assert "beam1_wall_s" in final
    assert "beam5_captions_per_sec_wall_s" in final


def test_bench_reprobes_after_mid_flight_backend_death(monkeypatch, capsys):
    """The tunnel can die BETWEEN a successful probe and the first device
    call (observed: 'No jellyfish device found' at beam1 compile).  bench
    must re-probe once and retry instead of giving up."""
    import jax.extend.backend as eb
    import bench
    monkeypatch.setattr(eb, "clear_backends", lambda: None)
    probes = []
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: probes.append(1) or ("cpu", None))
    calls = []

    def flaky_bench_once(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError(
                "Unable to initialize backend 'tpu': UNKNOWN: TPU "
                "initialization failed: No jellyfish device found.")
        return 77.0

    monkeypatch.setattr(bench, "bench_once", flaky_bench_once)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 77.0 and "error" not in obj
    assert len(probes) == 2  # initial + mid-flight re-probe
    assert len(calls) == 2


def test_bench_mid_flight_death_with_dead_reprobe(monkeypatch, capsys):
    """If the re-probe window also fails, bench emits the structured
    tpu_unavailable line (with whatever was measured) and exits cleanly."""
    import bench
    probes = []

    def probe(*a, **k):
        probes.append(1)
        return ("cpu", None) if len(probes) == 1 else None

    monkeypatch.setattr(bench, "_probe_backend", probe)

    def dead(*a, **k):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(bench, "bench_once", dead)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["error"] == "tpu_unavailable"
    assert obj["value"] is None


def test_bench_extras_recover_from_backend_blip(monkeypatch, capsys):
    """A backend death inside an extra re-probes once and retries that
    extra; later extras still run."""
    import jax.extend.backend as eb
    import bench
    monkeypatch.setattr(eb, "clear_backends", lambda: None)
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: ("cpu", None))
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 111.0)
    beam_calls = []

    def flaky_beam(*a, **k):
        beam_calls.append(1)
        if len(beam_calls) == 1:
            raise RuntimeError("UNAVAILABLE: backend gone")
        return 22.0

    monkeypatch.setattr(bench, "bench_beam", flaky_beam)
    monkeypatch.setattr(bench, "bench_train", lambda *a, **k: 33.0)
    monkeypatch.setattr(bench, "bench_train_fused", lambda *a, **k: 44.0)
    monkeypatch.setattr(bench, "bench_resnet", lambda *a, **k: 55.0)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["beam5_captions_per_sec"] == 22.0
    assert "beam5_captions_per_sec_error" not in obj
    assert obj["resnet101_images_per_sec"] == 55.0
    assert "error" not in obj


def test_bench_fallback_platform_adopts_via_reexec(monkeypatch, capsys):
    """When the probe only succeeds under a different JAX_PLATFORMS (the
    axon sitecustomize serves the tunneled chip as 'tpu' only when the env
    var is set at interpreter start), bench must RE-EXEC with that env —
    jax.config.update('jax_platforms', 'tpu') selects the native libtpu
    plugin instead ('No jellyfish device found', observed live)."""
    import bench
    reexecs = []
    monkeypatch.setattr(bench, "_reexec",
                        lambda jp, out, t0: reexecs.append((jp, dict(out))))
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: ("tpu", "tpu"))
    monkeypatch.setattr(bench.jax.config, "update", lambda *a: None)
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 99.0)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    assert reexecs and reexecs[0][0] == "tpu"
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 99.0  # loop-guard fallback path still measured


def test_bench_reexec_sets_env_and_guards_loop(monkeypatch):
    """_reexec must carry the measured numbers + wall origin through env and
    refuse to loop past MAX_REEXECS."""
    import bench
    calls = []
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    monkeypatch.setattr(os, "execv", lambda exe, argv: calls.append(argv))
    monkeypatch.delenv("CIC_BENCH_REEXEC", raising=False)
    # _reexec mutates JAX_PLATFORMS in-place: pre-seed it via monkeypatch so
    # teardown restores the pytest process env (order-dependence otherwise)
    monkeypatch.setenv("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
    out = {"value": 123.0, "partial": True}
    bench._reexec("tpu", out, 1000.0, 2000.0)
    assert calls, "execv not invoked"
    assert os.environ["JAX_PLATFORMS"] == "tpu"
    assert os.environ["CIC_BENCH_REEXEC"] == "1"
    assert json.loads(os.environ["CIC_BENCH_RESUME"]) == {"value": 123.0}
    assert float(os.environ["CIC_BENCH_T0"]) == 1000.0
    assert float(os.environ["CIC_BENCH_B0"]) == 2000.0
    # loop guard
    calls.clear()
    os.environ["CIC_BENCH_REEXEC"] = str(bench.MAX_REEXECS)
    bench._reexec("tpu", out, 1000.0)
    assert not calls
    for k in ("CIC_BENCH_REEXEC", "CIC_BENCH_RESUME", "CIC_BENCH_T0",
              "CIC_BENCH_B0"):
        os.environ.pop(k, None)


def test_bench_resume_skips_measured_subbenches(monkeypatch, capsys):
    """A re-exec'd bench must not re-measure what the first exec already
    did: beam1 and any extra with a value are skipped; failed extras
    (error entries) retry."""
    import bench
    monkeypatch.setenv("CIC_BENCH_RESUME", json.dumps({
        "value": 111.0, "vs_baseline": 0.02, "beam1_wall_s": 5.0,
        "beam2_captions_per_sec": 21.0, "beam5_captions_per_sec": 22.0,
        "train_mle_it_per_s_error": "UNAVAILABLE: backend gone"}))
    monkeypatch.setenv("CIC_BENCH_T0", repr(1.0))
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: ("cpu", None))
    called = {"beam1": 0, "beam5": 0, "train": 0}

    def no_beam1(*a, **k):
        called["beam1"] += 1
        return 0.0

    monkeypatch.setattr(bench, "bench_once", no_beam1)
    monkeypatch.setattr(
        bench, "bench_beam",
        lambda *a, **k: called.__setitem__("beam5", called["beam5"] + 1)
        or 999.0)
    monkeypatch.setattr(
        bench, "bench_train",
        lambda *a, **k: called.__setitem__("train", called["train"] + 1)
        or 33.0)
    monkeypatch.setattr(bench, "bench_train_fused", lambda *a, **k: 44.0)
    monkeypatch.setattr(bench, "bench_resnet", lambda *a, **k: 55.0)
    # the budget check uses the env T0=1.0 (epoch start) — huge elapsed would
    # skip every extra; neutralize by restoring a live origin
    monkeypatch.setenv("CIC_BENCH_T0", repr(__import__("time").time()))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert called == {"beam1": 0, "beam5": 0, "train": 1}
    assert obj["value"] == 111.0
    assert obj["beam2_captions_per_sec"] == 21.0
    assert obj["beam5_captions_per_sec"] == 22.0
    assert obj["train_mle_it_per_s"] == 33.0  # the failed extra retried


def test_bench_sigterm_emits_partial_line(tmp_path):
    """A driver-side `timeout` sends SIGTERM mid-extras; bench must exit 0
    with a parseable partial line carrying the already-measured numbers."""
    import signal as _signal
    code = (
        "import sys, time\n"
        "import bench\n"
        "bench._probe_backend = lambda *a, **k: ('cpu', None)\n"
        "bench.bench_once = lambda *a, **k: 111.0\n"
        "def slow(*a, **k):\n"
        "    print('EXTRA_STARTED', file=sys.stderr, flush=True)\n"
        "    time.sleep(600)\n"
        "bench.bench_beam = slow\n"
        "sys.argv = ['bench.py']\n"
        "bench.main()\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or REPO
    p = subprocess.Popen([sys.executable, "-c", code], cwd=REPO, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    # wait until the slow extra is running, then deliver the driver's TERM
    import time as _time
    deadline = _time.time() + 60
    while _time.time() < deadline:
        line = p.stderr.readline()
        if "EXTRA_STARTED" in line:
            break
    p.send_signal(_signal.SIGTERM)
    out, _ = p.communicate(timeout=60)
    assert p.returncode == 0
    obj = json.loads(out.strip().splitlines()[-1])
    assert obj["error"] == "terminated_mid_bench"
    assert obj["partial"] is True
    assert obj["value"] == 111.0  # beam1 survived the kill


def test_probe_backend_real_subprocess():
    """End-to-end probe in a real subprocess, pinned to CPU by stripping the
    axon sitecustomize from the child's PYTHONPATH: the default gate must
    never depend on tunnel health (with the tunnel down, an axon child
    either wedges for minutes or fails this test — round-4 review finding),
    nor contend for the single real chip on every pytest run."""
    import bench
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or REPO
    probe = bench._probe_backend(max_attempts=1, env=env)
    assert probe == ("cpu", None), probe


def test_bench_error_paths_cancel_watchdog(monkeypatch, capsys):
    """ADVICE r4 (medium): the mid-flight-death-with-dead-reprobe and
    beam1-failed return paths must disarm the wedge watchdog — a leaked
    daemon timer os._exit(0)s the HOST process (pytest!) ~35 min later,
    silently truncating a long test sweep with rc=0."""
    import threading
    import bench
    timers = []

    class SpyTimer(threading.Timer):
        def __init__(self, interval, fn):
            super().__init__(interval, fn)
            self.cancelled = False
            timers.append(self)

        def cancel(self):
            self.cancelled = True
            super().cancel()

    monkeypatch.setattr(threading, "Timer", SpyTimer)
    probes = []

    def probe(*a, **k):
        probes.append(1)
        return ("cpu", None) if len(probes) == 1 else None

    monkeypatch.setattr(bench, "_probe_backend", probe)

    def dead(*a, **k):
        raise RuntimeError("UNAVAILABLE: backend gone")

    monkeypatch.setattr(bench, "bench_once", dead)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    assert timers and all(t.cancelled for t in timers), timers

    # beam1-failed (non-backend) path too
    timers.clear()
    probes.clear()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: ("cpu", None))

    def oom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    monkeypatch.setattr(bench, "bench_once", oom)
    bench.main()
    assert timers and all(t.cancelled for t in timers), timers
    capsys.readouterr()


def test_bench_sigterm_handler_restored(monkeypatch, capsys):
    """ADVICE r4: main() must restore the pre-existing SIGTERM disposition —
    an in-process caller (pytest) must not permanently inherit a handler
    that converts a real SIGTERM into a clean exit-0."""
    import signal as sig
    import threading
    import bench
    import pytest as _pytest
    if threading.current_thread() is not threading.main_thread():
        _pytest.skip("signal handling requires the main thread")

    def sentinel(signum, frame):
        pass

    prev = sig.signal(sig.SIGTERM, sentinel)
    try:
        monkeypatch.setattr(bench, "_probe_backend",
                            lambda *a, **k: ("cpu", None))
        monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 1.0)
        monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
        bench.main()
        assert sig.getsignal(sig.SIGTERM) is sentinel
    finally:
        sig.signal(sig.SIGTERM, prev)
    capsys.readouterr()


def test_bench_last_good_attached_when_unavailable(
        monkeypatch, capsys, tmp_path):
    """VERDICT r4 item 1c: a null round must still carry machine-readable
    evidence — the newest artifacts/*/bench.json with a real value rides in
    the final line as last_good, with its capture date."""
    import bench
    art = tmp_path / "artifacts" / "roundX"
    art.mkdir(parents=True)
    (art / "bench.json").write_text(json.dumps(
        {"metric": "captions_per_sec_per_chip_beam1", "value": 123456.0,
         "unit": "captions/s", "beam5_captions_per_sec": 22000.0,
         "note": "fixture"}))
    assert bench._last_good(str(tmp_path))["value"] == 123456.0
    orig = bench._last_good
    monkeypatch.setattr(bench, "_last_good",
                        lambda root=None: orig(str(tmp_path)))
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["error"] == "tpu_unavailable"
    assert obj["value"] is None
    assert obj["last_good"]["value"] == 123456.0
    assert obj["last_good"]["beam5_captions_per_sec"] == 22000.0
    assert obj["last_good"]["captured"]
    assert obj["last_good"]["source"].endswith("bench.json")


def test_bench_dead_then_alive_initial_probe(monkeypatch, capsys):
    """VERDICT r4 item 1 done-criterion: a backend that is dead for the
    first probe attempts and comes back alive inside the (now ~2h) horizon
    must yield a real number in ONE driver run — no null record."""
    import bench
    calls = {"n": 0}

    def fake_run(cmd, env=None, timeout=None, **k):
        calls["n"] += 1
        if calls["n"] < 3:
            raise subprocess.TimeoutExpired(cmd="python", timeout=1)

        class R:
            returncode = 0
            stdout = "PROBE_OK cpu\n"
            stderr = ""
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("CIC_BENCH_PROBE_ATTEMPTS", "5")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")  # single probe candidate
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 777.0)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 777.0 and "error" not in obj
    assert calls["n"] == 3  # dead, dead, alive


def test_bench_mid_extras_abort_marks_final_partial(monkeypatch, capsys):
    """ADVICE r4: when the extras loop aborts on a dead re-probe, the FINAL
    line must carry partial=True — a consumer keying on 'partial absent =
    complete run' must not misread an aborted sweep as complete."""
    import bench
    probes = []

    def probe(*a, **k):
        probes.append(1)
        return ("cpu", None) if len(probes) == 1 else None

    monkeypatch.setattr(bench, "_probe_backend", probe)
    monkeypatch.setattr(bench, "bench_once", lambda *a, **k: 111.0)

    def dead(*a, **k):
        raise RuntimeError("UNAVAILABLE: backend gone")

    monkeypatch.setattr(bench, "bench_beam", dead)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 111.0
    assert obj["error"] == "tpu_unavailable_mid_extras"
    assert obj["partial"] is True  # final line must NOT claim completeness


def test_bench_failed_precondition_counts_as_backend_death(monkeypatch,
                                                           capsys):
    """The r4 judge's live failure mode: probe OK, then the first sub-bench
    dies with FAILED_PRECONDITION — bench must re-probe and retry instead of
    emitting the error line."""
    import jax.extend.backend as eb
    import bench
    monkeypatch.setattr(eb, "clear_backends", lambda: None)
    probes = []
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: probes.append(1) or ("cpu", None))
    calls = []

    def flaky(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError(
                "FAILED_PRECONDITION: backend deinitialized")
        return 88.0

    monkeypatch.setattr(bench, "bench_once", flaky)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--fast"])
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 88.0 and "error" not in obj
    assert len(probes) == 2 and len(calls) == 2
