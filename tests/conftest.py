import os

# Unit tests run on a virtual 8-device CPU mesh; the real-TPU paths are
# exercised by bench.py / __graft_entry__.py on hardware.
# Force CPU: the session env pins JAX to the (slow, remote) TPU tunnel and
# the axon sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config.update (overriding the env var), so we must update the config
# back after import.  Set DTK_TEST_TPU=1 to run against the real TPU.
if not os.environ.get("DTK_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import subprocess  # noqa: E402

import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# Build the native C++ engines BEFORE collection: the native-gated tests'
# skipif conditions (native_referee/native_thread.available()) are
# evaluated while test modules import, so on a fresh checkout (no
# build/*.so yet) they would all skip even though the libs build fine.
# A no-op make returns in milliseconds once the libs are current.
_NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")
try:
    _r = subprocess.run(["make", "-C", _NATIVE], check=False,
                        capture_output=True, timeout=300, text=True)
    if _r.returncode != 0:
        import sys as _sys
        print(f"WARNING: native build failed (rc={_r.returncode}); "
              f"native-gated tests will skip.  stderr tail:\n"
              f"{_r.stderr[-2000:]}", file=_sys.stderr)
except Exception as _e:  # tests that need the libs skip with their own reason
    import sys as _sys
    print(f"WARNING: native build could not run ({_e}); "
          f"native-gated tests will skip", file=_sys.stderr)


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN
