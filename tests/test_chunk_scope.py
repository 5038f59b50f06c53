"""Lane-chunking must stay scoped to the Pallas kernel trace.

Regression test for a round-3 incident: MUL_CHUNK=128 as a module
default leaked into the XLA paths (EC scalar mult, reference walk),
splitting every wide mulmod into n/128 tiny HLO ops -- herd creation
alone then compiled for 40+ minutes through the remote compile
service.  Chunking may only activate under field.chunking(), which
only the Pallas kernel body enters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.ops import field


def _concat_count(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    return sum(
        1 for eqn in jaxpr.jaxpr.eqns if eqn.primitive.name == "concatenate"
    )


def test_xla_mulmod_not_chunked():
    a = jnp.zeros((16, 4096), jnp.uint32)
    b = jnp.ones((16, 4096), jnp.uint32)
    saved = field.MUL_CHUNK
    field.MUL_CHUNK = 128
    try:
        assert not field.CHUNK_ACTIVE
        # outside the kernel context: one whole-array graph, no
        # per-chunk concatenation sweep (the tree itself uses a
        # handful of concats for row fitting).  Fresh lambdas: jax
        # caches traces per callable, and the chunk decision is a
        # trace-time global.
        n_plain = _concat_count(lambda x, y: field.mulmod(x, y), a, b)
        with field.chunking():
            n_chunked = _concat_count(
                lambda x, y: field.mulmod(x, y), a, b
            )
        assert n_chunked > n_plain + 16, (n_plain, n_chunked)
        assert n_plain < n_chunked / 4, (n_plain, n_chunked)
    finally:
        field.MUL_CHUNK = saved


def test_chunking_context_restores_on_error():
    try:
        with field.chunking():
            assert field.CHUNK_ACTIVE
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not field.CHUNK_ACTIVE


def test_chunked_matches_unchunked_values():
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randint(0, 1 << 16, (16, 256)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 16, (16, 256)).astype(np.uint32))
    saved = field.MUL_CHUNK
    field.MUL_CHUNK = 64
    try:
        want = np.asarray(field.mulmod(a, b))
        with field.chunking():
            got = np.asarray(field.mulmod(a, b))
        np.testing.assert_array_equal(got, want)
    finally:
        field.MUL_CHUNK = saved
