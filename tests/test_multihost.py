"""Multi-host batch-job semantics (parallel/multihost.py).

Three promises get proven here rather than asserted:

* the ``jax.distributed`` control plane actually comes up across OS
  processes and our mesh code runs cross-process collectives over it
  (2-process CPU smoke via Gloo);
* a host that dies mid-run can be re-run with ``--skip-existing`` and
  does only the missing work, never rewriting finished outputs;
* the file assignment is stable enough that a *rebalanced* re-run
  (fewer hosts after a permanent loss) still completes the set without
  redoing finished files.

Reference analog: the reference scales across GPUs by pinning one
ensemble pass per device in its parallel Kaggle notebook
(notebook/WhisperJAV_kaggle_parallel_edition.ipynb); SURVEY §2.2 maps
cross-host scaling for this workload to file-set sharding over DCN.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from whisperjav_tpu import cli
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.modules.audio_io import write_wav

REPO = Path(__file__).resolve().parent.parent

TINY = WhisperConfig(name="mh-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)


@pytest.fixture
def tiny_loader(monkeypatch):
    params = init_params(TINY, jax.random.PRNGKey(0))
    import whisperjav_tpu.pipelines.factory as factory
    monkeypatch.setattr(factory, "load_model",
                        lambda *a, **k: (TINY, params))


def _wav(tmp_path, name, seconds=3.0):
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    x = (0.3 * np.sin(2 * np.pi * 200 * t)
         * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    p = tmp_path / name
    write_wav(p, x, sr)
    return p


def _child_env() -> dict:
    """Env for spawned children. The in-script os.environ pins are too
    late here: a sitecustomize hook imports jax at interpreter start, so
    platform/device-count must arrive via the PROCESS environment (the
    parent pytest env carries device_count=8, which would give the two
    children 16 global devices and break the 1-row-per-process arrays)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return env


# ------------------------------------------------- distributed smoke

_CHILD = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, {repo!r})
from whisperjav_tpu.parallel.multihost import (
    initialize_distributed, shard_files,
)
proc, n = initialize_distributed(sys.argv[1], 2, int(sys.argv[2]))
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(jax.devices(), ("data",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), jnp.ones((1,)) * (proc + 1))
s = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
mine = shard_files([f"f{{i}}" for i in range(5)], proc, n)
print("RESULT", proc, n, float(s), ",".join(mine), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    """initialize_distributed really connects two OS processes: global
    device view spans both, and a cross-process sum runs over Gloo."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=str(REPO)))

    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_child_env())
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    shards = {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        _, proc, n, total, mine = line.split(" ", 4)
        assert int(n) == 2
        # cross-process collective: 1 (proc 0) + 2 (proc 1)
        assert float(total) == 3.0
        shards[int(proc)] = mine.split(",")
    assert sorted(shards[0] + shards[1]) == [f"f{i}" for i in range(5)]
    assert not set(shards[0]) & set(shards[1])


_CLI_CHILD = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["WJAV_COMPILE_CACHE"] = "0"
sys.path.insert(0, {repo!r})
import jax
import whisperjav_tpu.pipelines.factory as factory
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
TINY = WhisperConfig(name="mh-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)
params = init_params(TINY, jax.random.PRNGKey(0))
factory.load_model = lambda *a, **k: (TINY, params)
from whisperjav_tpu import cli
rc = cli.main([sys.argv[3], "--multihost", "--coordinator", sys.argv[1],
               "--num-hosts", "2", "--host-id", sys.argv[2],
               "--mode", "faster", "--model", "tiny", "--skip-existing",
               "--output-dir", sys.argv[4]])
print("CLI_RC", rc, flush=True)
sys.exit(rc)
"""


@pytest.mark.slow
def test_two_process_cli_transcribe_disjoint(tmp_path):
    """VERDICT round-4 #4: two OS processes run the REAL CLI under one
    jax.distributed control plane over a shared directory — each
    transcribes exactly its slice (disjoint, covering), outputs land in
    the shared output dir, and --skip-existing re-runs are no-ops."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    for i in range(4):
        _wav(tmp_path, f"m{i}.wav", seconds=2.0)
    out = tmp_path / "out"
    script = tmp_path / "cli_child.py"
    script.write_text(_CLI_CHILD.format(repo=str(REPO)))

    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid), str(tmp_path),
         str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_child_env())
        for pid in (0, 1)]
    for p in procs:
        try:
            _out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process CLI transcribe timed out")
        assert p.returncode == 0, err[-2000:]

    srts = sorted(p.name for p in out.glob("m*.ja.whisperjav.srt"))
    assert srts == [f"m{i}.ja.whisperjav.srt" for i in range(4)]
    # re-running the whole job with --skip-existing must be a no-op on
    # every host (nothing rewritten) — initialize() barriers on all
    # processes, so the re-run launches both
    before = {p.name: p.read_text() for p in out.glob("*.srt")}
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port2 = s.getsockname()[1]
    rerun = [subprocess.Popen(
        [sys.executable, str(script), f"localhost:{port2}", str(pid),
         str(tmp_path), str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_child_env())
        for pid in (0, 1)]
    for p in rerun:
        try:
            _out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in rerun:
                q.kill()
            pytest.fail("skip-existing re-run timed out")
        assert p.returncode == 0, err[-2000:]
    after = {p.name: p.read_text() for p in out.glob("*.srt")}
    assert after == before


# ------------------------------------------- duration-weighted sharding

def test_shard_files_duration_balanced():
    """With full duration info, assignment balances AUDIO HOURS (greedy
    LPT), not file counts: a 2 h feature pins one host while the short
    clips fill the other."""
    from whisperjav_tpu.modules.media_discovery import MediaInfo
    from whisperjav_tpu.parallel.multihost import shard_files
    files = [MediaInfo(path=Path(f"/x/{n}.wav"), basename=n, duration=d)
             for n, d in [("a", 7200.0), ("b", 600.0), ("c", 660.0),
                          ("d", 630.0), ("e", 640.0), ("f", 610.0)]]
    s0 = shard_files(files, 0, 2)
    s1 = shard_files(files, 1, 2)
    names0 = {m.basename for m in s0}
    names1 = {m.basename for m in s1}
    assert names0 | names1 == {m.basename for m in files}
    assert not names0 & names1
    # the feature-length file rides alone; all five clips land together
    assert {"a"} in (names0, names1)
    # determinism across re-runs (resume contract)
    assert [m.basename for m in shard_files(files, 0, 2)] == \
           [m.basename for m in s0]


def test_shard_files_round_robin_without_durations():
    """Missing durations degrade to stable round-robin by name."""
    from whisperjav_tpu.parallel.multihost import shard_files
    files = [f"f{i}" for i in range(5)]
    s0 = shard_files(files, 0, 2)
    s1 = shard_files(files, 1, 2)
    assert s0 == ["f0", "f2", "f4"] and s1 == ["f1", "f3"]


# ------------------------------------------- resume / skip-existing

def _fake_done(out_dir: Path, stem: str) -> Path:
    """Stand-in for an SRT a host finished before dying."""
    out_dir.mkdir(parents=True, exist_ok=True)
    p = out_dir / f"{stem}.ja.whisperjav.srt"
    p.write_text("1\n00:00:00,000 --> 00:00:01,000\nfinished-before-crash\n")
    return p


def test_resume_noop_when_all_outputs_exist(tmp_path, monkeypatch):
    """A re-run over a completed slice exits 0 without touching the
    model or any finished output (no load_model call at all)."""
    from whisperjav_tpu.parallel import multihost as mh
    import whisperjav_tpu.pipelines.factory as factory
    monkeypatch.setattr(mh, "initialize_distributed",
                        lambda *a, **k: (0, 2))

    def boom(*a, **k):
        raise AssertionError("load_model must not run on a no-op resume")
    monkeypatch.setattr(factory, "load_model", boom)

    for i in range(4):
        _wav(tmp_path, f"m{i}.wav")
    out = tmp_path / "out"
    done = [_fake_done(out, f"m{i}") for i in (0, 2)]   # host 0's slice
    before = [p.read_text() for p in done]
    rc = cli.main([str(tmp_path), "--multihost", "--skip-existing",
                   "--mode", "faster", "--model", "tiny",
                   "--output-dir", str(out)])
    assert rc == 0
    assert [p.read_text() for p in done] == before


@pytest.mark.slow
def test_resume_after_host_failure(tiny_loader, tmp_path, monkeypatch):
    """Host 1 of 2 died after finishing m1 but not m3; its re-run with
    --skip-existing transcribes ONLY m3 and leaves m1's output
    byte-identical."""
    from whisperjav_tpu.parallel import multihost as mh
    monkeypatch.setattr(mh, "initialize_distributed",
                        lambda *a, **k: (1, 2))
    for i in range(4):
        _wav(tmp_path, f"m{i}.wav")
    out = tmp_path / "out"
    survivor = _fake_done(out, "m1")        # finished before the crash
    before = survivor.read_text()

    rc = cli.main([str(tmp_path), "--multihost", "--skip-existing",
                   "--mode", "faster", "--model", "tiny",
                   "--output-dir", str(out)])
    assert rc == 0
    assert survivor.read_text() == before           # not rewritten
    assert (out / "m3.ja.whisperjav.srt").exists()  # the missing work
    # hosts 0's files were never this process's business
    assert not (out / "m0.ja.whisperjav.srt").exists()
    assert not (out / "m2.ja.whisperjav.srt").exists()


@pytest.mark.slow
def test_rebalanced_rerun_completes_set(tiny_loader, tmp_path, monkeypatch):
    """After a permanent host loss the operator re-runs single-process
    with --skip-existing: finished outputs stay untouched, every
    missing file gets transcribed exactly once."""
    from whisperjav_tpu.parallel import multihost as mh
    monkeypatch.setattr(mh, "initialize_distributed",
                        lambda *a, **k: (0, 1))
    for i in range(3):
        _wav(tmp_path, f"m{i}.wav")
    out = tmp_path / "out"
    done = _fake_done(out, "m0")
    before = done.read_text()

    rc = cli.main([str(tmp_path), "--multihost", "--skip-existing",
                   "--mode", "faster", "--model", "tiny",
                   "--output-dir", str(out)])
    assert rc == 0
    assert done.read_text() == before
    names = sorted(p.name for p in out.glob("*.whisperjav.srt"))
    assert names == [f"m{i}.ja.whisperjav.srt" for i in range(3)]
