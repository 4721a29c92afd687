"""Driver-contract checks: entry() compiles; dryrun_multichip(8) runs the
full DP train steps + sharded mask search on the virtual CPU mesh."""

import jax
import pytest


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 174)


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    assert jax.device_count() >= 8
    dryrun_multichip(8)
