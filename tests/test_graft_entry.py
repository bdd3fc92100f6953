"""Driver entry points keep working: single-chip compile + 8-way dryrun."""

import os
import subprocess
import sys


def test_entry_and_dryrun():
    # run in a subprocess so backend re-configuration stays isolated
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "os.environ['XLA_FLAGS']="
        "'--xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as ge\n"
        "fn, args = ge.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('entry-ok')\n"
        "ge.dryrun_multichip(8)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "entry-ok" in r.stdout
    assert "dryrun_multichip(8): step ok" in r.stdout
    assert "funnel ok=True" in r.stdout
