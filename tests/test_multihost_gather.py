"""Multi-host eval result gather (apis.allgather_pickled /
multihost_dataset_inference).

Two tiers:
  * single-process: allgather_pickled round-trips arbitrary objects and
    multihost_dataset_inference degrades to dataset_inference;
  * REAL 2-process jax.distributed CPU cluster: both ranks gather each
    other's (variable-size!) shards (subprocess-based; skipped if the
    distributed service cannot bind).
"""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def test_allgather_pickled_single_process():
    from dfm_tpu.apis import allgather_pickled
    obj = {'a': np.arange(7), 'b': ['x', (1, 2)]}
    out = allgather_pickled(obj)
    assert len(out) == 1
    assert np.array_equal(out[0]['a'], obj['a'])
    assert out[0]['b'] == obj['b']


WORKER = textwrap.dedent('''
    import os, sys, pickle
    import numpy as np
    sys.path.insert(0, %(repo)r)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    rank = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address='localhost:%(port)d',
                               num_processes=2, process_id=rank)
    from dfm_tpu.apis import allgather_pickled
    # deliberately different sizes per rank
    mine = {i: np.full((rank + 1, 3), rank, np.float32)
            for i in range(rank, 5, 2)}
    out = allgather_pickled(mine)
    assert len(out) == 2
    merged = {}
    for shard in out:
        merged.update(shard)
    assert sorted(merged) == [0, 1, 2, 3, 4]
    for i, v in merged.items():
        assert v.shape[0] == (i %% 2) + 1
        assert (v == i %% 2).all()
    print(f'rank {rank} OK')
''')


@pytest.mark.slow
def test_allgather_pickled_two_processes(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    script = WORKER % dict(repo=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), port=port)
    f = tmp_path / 'worker.py'
    f.write_text(script)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    procs = [subprocess.Popen([sys.executable, str(f), str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip('distributed service did not come up in time')
        outs.append(out.decode())
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {r} failed:\n{out}'
        assert f'rank {r} OK' in out
