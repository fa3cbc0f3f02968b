"""Multi-device mesh: dp mapping step on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_lc_submesh():
    from eags_slam_tpu.parallel.mesh import lc_submesh, make_mesh

    mesh = make_mesh()
    lc = lc_submesh(mesh, 2)
    assert lc.devices.size == 2
    assert lc.axis_names == ("lc",)
