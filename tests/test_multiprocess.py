"""Multi-process (multi-host) distributed execution — the one SURVEY §5.8
capability single-process tests cannot reach.

Shells out to scripts/run_multiprocess_dp.py, which spawns TWO OS processes
with `jax.distributed.initialize` over a local coordinator (CPU backend,
Gloo collectives), builds a 4-device mesh spanning both, and runs the real
SiameseTrainer through:
  * parallel/mesh.maybe_distributed_init (explicit env contract),
  * put_dataset_global's `make_array_from_process_local_data` branch
    (process_count() > 1), and
  * 2 dp train steps + 1 eval step whose losses must equal a
    single-process 4-device run of the identical workload.

The reference has no distributed code of any kind (SURVEY.md §2;
/root/reference/train.py:23 is a bare cuda-or-cpu pick).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multiprocess_dp.py")


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    env = dict(os.environ)
    # The launcher sets its own XLA_FLAGS/JAX_* per subprocess; scrub this
    # test process's virtual-device forcing so it doesn't leak through.
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, (
        f"multiprocess dp run failed\nstdout:\n{r.stdout[-4000:]}\n"
        f"stderr:\n{r.stderr[-2000:]}"
    )
    assert "MULTIPROCESS DP OK" in r.stdout
