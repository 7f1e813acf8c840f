"""Multi-HOST execution: the ``jax.process_count() > 1`` branch of
utils/dist.py run for real (VERDICT r4 missing #5).

Every in-process test sees ``process_count() == 1``, so the pickle-over-array
framing of ``gather_predictions`` and the ``process_allgather`` path of
``all_gather_arrays`` short-circuited in all prior suites — a typo in the
byte framing would have shipped.  Here two REAL processes form a JAX
distributed cluster over a localhost coordinator
(``jax.distributed.initialize``), shard an eval, decode, and merge —
mirroring the reference's pickle+all_gather eval
(map_nav_src/utils/distributed.py:90-160, sel_data_idxs env.py:126-134).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(worker_src: str, tmp_path, args=(), timeout=900):
    """Launch the worker script as 2 coordinated processes; return their
    parsed RESULT payloads [proc0, proc1]."""
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # 1 CPU device per process: an honest host
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(pid), *map(str, args)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(lines[-1][len("RESULT "):]))
    return sorted(outs, key=lambda o: o["pid"])


GATHER_WORKER = f"""
import sys, json
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)
import numpy as np
sys.path.insert(0, {REPO!r})
from vln_magic_tpu.utils import dist

assert dist.process_count() == 2, dist.process_count()
items = [{{"instr_id": f"it_{{i}}"}} for i in range(7)]
mine = dist.shard_items(items)
# deliberately DIFFERENT payload sizes per process: the byte framing must
# pad to the max and slice back per-process sizes
preds = [{{"instr_id": it["instr_id"], "src": pid,
           "traj": [[f"n{{j}}" for j in range(3 + pid)]]}} for it in mine]
merged = dist.gather_predictions(preds)
arr = dist.all_gather_arrays(np.full(3, pid, np.int32))
print("RESULT " + json.dumps({{
    "pid": pid, "n_mine": len(mine), "primary": dist.is_primary(),
    "merged_ids": sorted(p["instr_id"] for p in merged),
    "merged_srcs": sorted(set(p["src"] for p in merged)),
    "gathered": arr.tolist()}}), flush=True)
"""


def test_two_process_gather_primitives(tmp_path):
    """shard_items / all_gather_arrays / gather_predictions with a REAL
    2-process cluster: contiguous shards (3+4 of 7), byte-framed pickle
    merge identical on both processes, array gather = [P, ...]."""
    outs = _run_pair(GATHER_WORKER, tmp_path)
    assert outs[0]["primary"] and not outs[1]["primary"]
    assert outs[0]["n_mine"] == 3 and outs[1]["n_mine"] == 4
    want = sorted(f"it_{i}" for i in range(7))
    for o in outs:
        assert o["merged_ids"] == want
        assert o["merged_srcs"] == [0, 1]      # both processes contributed
        assert o["gathered"] == [[0, 0, 0], [1, 1, 1]]


CLI_WORKER = f"""
import sys, json
port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)
sys.path.insert(0, {REPO!r})
from vln_magic_tpu.cli.main_nav import main

results = main([
    "--mode", "valid", "--name", f"mh{{pid}}", "--output_dir", outdir,
    "--student_hidden_size", "32", "--student_num_attention_heads", "2",
    "--num_l_layers", "1", "--num_pano_layers", "1", "--num_x_layers", "1",
    "--batch_size", "2", "--max_instr_len", "32", "--max_action_len", "3",
    "--max_gmap_len", "16",
    "--synthetic_scans", "1", "--synthetic_nodes", "12",
    "--synthetic_items", "10", "--synthetic_feat_dim", "16",
])
print("RESULT " + json.dumps({{
    "pid": pid,
    "metrics": {{s: {{k: float(v) for k, v in avg.items()}}
                 for s, avg in results.items()}}}}), flush=True)
"""


def test_two_process_cli_valid_matches_single_process(tmp_path):
    """The CLI's distributed eval end-to-end: two processes each decode
    their shard_items slice and merge predictions over the collective; the
    metrics (computed from MERGED predictions against the full split) must
    be identical on both processes AND equal to a single-process run of the
    same synthetic eval (the reference's DDP eval contract,
    main_nav.py:606-607)."""
    from vln_magic_tpu.cli.main_nav import main

    single = main([
        "--mode", "valid", "--name", "mh_single",
        "--output_dir", str(tmp_path),
        "--student_hidden_size", "32", "--student_num_attention_heads", "2",
        "--num_l_layers", "1", "--num_pano_layers", "1", "--num_x_layers", "1",
        "--batch_size", "2", "--max_instr_len", "32", "--max_action_len", "3",
        "--max_gmap_len", "16",
        "--synthetic_scans", "1", "--synthetic_nodes", "12",
        "--synthetic_items", "10", "--synthetic_feat_dim", "16",
    ])
    outs = _run_pair(CLI_WORKER, tmp_path, args=(str(tmp_path),))
    m0, m1 = outs[0]["metrics"], outs[1]["metrics"]
    assert m0 == m1                      # merged preds -> identical metrics
    for split, avg in single.items():
        for k, v in avg.items():
            assert m0[split][k] == pytest.approx(float(v), rel=1e-5), \
                (split, k)
