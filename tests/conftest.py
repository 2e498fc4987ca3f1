"""Test configuration: force an 8-device virtual CPU mesh.

Tests never need the real TPU; multi-device sharding tests run against
XLA's host-platform device emulation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's site hook pins JAX_PLATFORMS=axon (real TPU tunnel);
# unit tests must run on the virtual 8-device CPU platform instead.
jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compile cache for CPU tests — XLA:CPU
# AOT results here carry machine-feature flags that mismatch the host
# ("prefer-no-scatter ... could lead to SIGILL").

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_text_frontend_globals():
    """The text frontend keeps module-level state by design (the injected
    acronym CMUdict and the heteronyms path — mirroring the reference's
    module-global loads). Constructing a Data sets them — including from
    module-scoped fixtures, which instantiate before any function-scoped
    snapshot — so reset to the pristine import-time state after every
    test to keep goldens order-independent."""
    import flowtron_tpu.text as t
    from flowtron_tpu.text import cleaners as cl

    yield
    cl._acronym_cmudict = None
    t._heteronyms = None
    t._heteronyms_path = None


@pytest.fixture(scope="session")
def mini_cmudict(tmp_path_factory):
    """A small CMUdict-format fixture covering words used in tests."""
    content = "\n".join([
        ";;; comment line ignored",
        "AM  EY1 EH1 M",
        "HOUSE  HH AW1 S",
        "HOUSE(1)  HH AW1 Z",
        "STREET  S T R IY1 T",
        "TURN  T ER1 N",
        "LEFT  L EH1 F T",
        "ON  AA1 N",
        "THE  DH AH0",
        "THE(1)  DH AH1",
        "THE(2)  DH IY0",
        "CAT  K AE1 T",
        "CATS  K AE1 T S",
        "READ  R EH1 D",
        "READ(1)  R IY1 D",
        "NASA  N AE1 S AH0",
        "DOG  D AO1 G",
        "WAVEGLOW  W EY1 V G L OW2",
    ]) + "\n"
    path = tmp_path_factory.mktemp("textdata") / "mini_cmudict"
    path.write_text(content, encoding="latin-1")
    return str(path)


@pytest.fixture(scope="session")
def mini_heteronyms(tmp_path_factory):
    path = tmp_path_factory.mktemp("textdata2") / "heteronyms"
    path.write_text("read\nlive\nbass\n", encoding="utf-8")
    return str(path)
