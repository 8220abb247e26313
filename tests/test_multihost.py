"""Multi-host (P6) execution test: 2 real processes under
jax.distributed on CPU backends.

The reference pattern this matches is PLL's fine-grain MPI mode
(/root/reference/pll/genericParallelization.c:105-282): every worker
owns a contiguous site range, partial log-likelihoods reduce to the
master, and the master broadcasts topology/stop decisions.  Here both
processes run the SAME SPMD program over a global 2-process x 2-device
CPU mesh; the lnL psum crosses the process boundary, and
broadcast_host_data / sync_global_flag carry the host-side decisions.

Spawns two subprocesses (localhost coordinator) that each compute the
sharded lnL of the example alignment and exercise the broadcast/flag
helpers; rank 0 prints results for the parent to assert against the
single-process value.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.parallel import multihost, make_mesh, set_mesh
from iqtree_tpu.parallel.multihost import (broadcast_host_data,
                                           is_multihost, sync_global_flag)

rank = int(os.environ["JAX_PROCESS_ID"])
ok = multihost.init_multihost()
assert ok, "init_multihost did not initialize a multi-process runtime"
assert is_multihost()
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

mesh = make_mesh()
set_mesh(mesh)

from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.engine.likelihood import (ModelArrays, SiteData,
                                          TreeArrays)
from iqtree_tpu.engine.kernels.pruning import (device_slot_schedule,
                                               fused_compute_loglik)

aln = read_alignment(os.path.join(%(repo)r, "tests/data/example.phy"))
tree = random_tree(aln.n_taxa, np.random.default_rng(7))
subst, rate = parse_model_string("GTR+G", aln)
ma = ModelArrays.from_model(subst, rate, jnp.float64)
site = SiteData.from_alignment(aln, jnp.float64)   # auto-shards patterns
ta = TreeArrays.from_tree(tree, jnp.float64)
steps, n_slots = device_slot_schedule(tree, ta)
lnl, _ = fused_compute_loglik(ta, ma, site, jnp.asarray(steps), n_slots)
lnl = float(lnl)

# broadcast: rank 0's payload must reach rank 1 verbatim
payload = {"tree": "((a,b),c);", "lnl": lnl} if rank == 0 else None
got = broadcast_host_data(payload if rank == 0 else {"tree": "", "lnl": 0.0},
                          is_source=(rank == 0))

# global flag: only rank 1 hits the condition; both must agree True
flag = sync_global_flag(rank == 1)
assert flag, "sync_global_flag lost rank 1's True"
flag0 = sync_global_flag(False)
assert not flag0, "sync_global_flag fabricated a True"

print(json.dumps({"rank": rank, "lnl": lnl,
                  "bcast_tree": str(got["tree"]),
                  "bcast_lnl": float(got["lnl"])}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_lnl_parity(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    procs = []
    env_common = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
        "IQTREE_TPU_NO_CACHE": "1",
    }
    for rank in range(2):
        env = {**env_common, "JAX_PROCESS_ID": str(rank)}
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # single-process oracle on the same data/tree
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iqtree_tpu.engine.kernels.pruning import (device_slot_schedule,
                                                   fused_compute_loglik)
    from iqtree_tpu.engine.likelihood import (ModelArrays, SiteData,
                                              TreeArrays)
    from iqtree_tpu.io.alignment import read_alignment
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.parallel import set_mesh
    from iqtree_tpu.trees.tree import random_tree

    set_mesh(None)
    aln = read_alignment(os.path.join(REPO, "tests/data/example.phy"))
    tree = random_tree(aln.n_taxa, np.random.default_rng(7))
    subst, rate = parse_model_string("GTR+G", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    site = SiteData.from_alignment(aln, jnp.float64)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    steps, n_slots = device_slot_schedule(tree, ta)
    lnl_ref, _ = fused_compute_loglik(ta, ma, site, jnp.asarray(steps),
                                      n_slots)
    lnl_ref = float(lnl_ref)

    for o in outs:
        assert abs(o["lnl"] - lnl_ref) < 1e-6, (o, lnl_ref)
        assert o["bcast_tree"] == "((a,b),c);"
        assert abs(o["bcast_lnl"] - outs[0]["lnl"]) < 1e-9
