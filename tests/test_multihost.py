"""Multi-host (DCN) recipe: 2 processes x 4 CPU devices each.

The TPU answer to "test multi-node without a cluster" one level up from the
virtual single-process mesh: two real OS processes joined through
`jax.distributed.initialize`, a global 8-device mesh with the process (DCN)
dimension outermost, per-process local batch shards assembled into global
arrays, and a jitted gradient step whose psum crosses the process boundary.
Asserts both processes compute identical, correct global results.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
        ' --xla_force_host_platform_device_count=4'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp
    from pdm_ssd_tpu.parallel.mesh import (
        init_multihost, make_multihost_mesh, shard_batch_multihost,
        data_parallel_shardings)

    pid = int(sys.argv[1])
    init_multihost(coordinator=%(coord)r, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    mesh = make_multihost_mesh()
    # per-process local batch: process p owns samples [4p, 4p+4)
    local = {'x': (np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
                   + 100 * pid)}
    gbatch = shard_batch_multihost(local, mesh)
    assert gbatch['x'].shape == (8, 3)

    _, rep = data_parallel_shardings(mesh)
    w = jax.device_put(jnp.ones((3,), jnp.float32), rep)

    @jax.jit
    def step(w, x):
        def loss_fn(w):
            return jnp.mean(jnp.sum(x * w[None, :], axis=1) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, g

    loss, g = step(w, gbatch['x'])
    # expected over the GLOBAL batch (both halves), same on every process
    xs = np.concatenate([np.arange(12, dtype=np.float32).reshape(4, 3),
                         np.arange(12, dtype=np.float32).reshape(4, 3) + 100])
    want_loss = np.mean(xs.sum(1) ** 2)
    got = float(jax.device_get(loss))
    assert abs(got - want_loss) / want_loss < 1e-5, (got, want_loss)
    print(f'proc {pid} OK loss={got:.3f}')
""")


def test_two_process_dcn_mesh(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coord = f'localhost:{port}'
    script = tmp_path / 'worker.py'
    script.write_text(WORKER % {'repo': str(REPO), 'coord': coord})

    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc {i} failed:\n{out[-3000:]}'
        assert f'proc {i} OK' in out
