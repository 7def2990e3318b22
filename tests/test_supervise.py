"""Supervisor: stall detection, resume relaunch, failure passthrough."""

import sys
import textwrap

from meanflow_audio_codec_tpu.tools.supervise import (
    EXIT_EXHAUSTED,
    run_supervised,
)


def _child(tmp_path, body: str) -> list[str]:
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(body))
    return [sys.executable, "-u", str(script)]


def test_clean_child_passes_through(tmp_path, capfd):
    rc = run_supervised(["--foo"], stall_timeout=30, max_restarts=2,
                        command=_child(tmp_path, """
        import sys
        print("step 0: ok")
        sys.exit(0)
    """))
    assert rc == 0
    assert "step 0: ok" in capfd.readouterr().out


def test_real_failure_not_retried(tmp_path, capfd):
    marker = tmp_path / "launches"
    rc = run_supervised([], stall_timeout=30, max_restarts=5,
                        command=_child(tmp_path, f"""
        from pathlib import Path
        m = Path({str(marker)!r})
        m.write_text(m.read_text() + "x" if m.exists() else "x")
        raise SystemExit(3)
    """))
    assert rc == 3
    assert marker.read_text() == "x"  # launched exactly once


def test_stalled_child_restarted_with_resume(tmp_path, capfd):
    """First launch hangs silently; the relaunch (--resume appended)
    completes. The supervisor must kill the hung child and return 0."""
    marker = tmp_path / "launches"
    # stall_timeout must dominate worst-case interpreter startup under a
    # loaded host (a concurrent training run): the stall timer starts at
    # launch, so a margin tighter than startup time kills a healthy child
    # before its first heartbeat line ever prints (observed flake at 2 s).
    rc = run_supervised(["--workdir", "w"], stall_timeout=10, max_restarts=2,
                        command=_child(tmp_path, f"""
        import sys, time
        from pathlib import Path
        m = Path({str(marker)!r})
        n = len(m.read_text()) if m.exists() else 0
        m.write_text("x" * (n + 1))
        if n == 0:
            print("step 0: before hang")
            time.sleep(120)  # simulated dead-tunnel hang (killed by parent)
        else:
            assert "--resume" in sys.argv, sys.argv
            print("resumed fine")
    """), heartbeat_poll=0.2)
    assert rc == 0
    assert marker.read_text() == "xx"  # exactly one restart
    out = capfd.readouterr().out
    assert "before hang" in out and "resumed fine" in out
    assert "killing" in out


def test_restart_budget_exhausted(tmp_path):
    rc = run_supervised([], stall_timeout=1, max_restarts=1,
                        command=_child(tmp_path, """
        import time
        time.sleep(60)
    """), heartbeat_poll=0.2)
    assert rc == EXIT_EXHAUSTED
