"""Mask semantics tests — dense mask vs a brute-force oracle of the
reference mask_mod (reference: owl_wms/nn/attn.py:43-58) and the
ring-cache decode mask."""

import numpy as np
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.ops.masks import (
    dense_mask, decode_mask_from_cache,
)


def oracle(n_tokens, tpf, window_len, doc_id, q_offset, is_causal):
    """Direct transliteration of the reference mask_mod semantics."""
    n_frames = -(-n_tokens // tpf)
    if window_len is None:
        window_len = n_frames
    fid = np.arange(n_tokens) // tpf
    q_len = n_tokens - q_offset
    b = 1 if doc_id is None else doc_id.shape[0]
    out = np.zeros((b, q_len, n_tokens), dtype=bool)
    for bi in range(b):
        for q in range(q_len):
            for kv in range(n_tokens):
                fq, fkv = fid[q + q_offset], fid[kv]
                ok = abs(fq - fkv) < window_len
                if is_causal:
                    ok = ok and fkv <= fq
                if doc_id is not None:
                    ok = ok and doc_id[bi, fq] == doc_id[bi, fkv]
                out[bi, q, kv] = ok
    return out if doc_id is not None else out[0]


@pytest.mark.parametrize("n_tokens,tpf,window,q_offset,causal", [
    (32, 4, None, 0, True),
    (32, 4, 3, 0, True),
    (32, 4, 3, 0, False),
    (32, 4, 2, 24, True),
    (30, 5, None, 25, True),
])
def test_dense_mask_matches_oracle(n_tokens, tpf, window, q_offset, causal):
    got = np.asarray(dense_mask(n_tokens, tpf, window, None, q_offset, causal))
    want = oracle(n_tokens, tpf, window, None, q_offset, causal)
    np.testing.assert_array_equal(got, want)


def test_dense_mask_doc_id():
    doc = np.array([[0, 0, 0, 1, 1, 2, 2, 2]], dtype=np.int32)
    got = np.asarray(dense_mask(32, 4, None, jnp.asarray(doc), 0, True))
    want = oracle(32, 4, None, doc, 0, True)
    np.testing.assert_array_equal(got, want)


def test_decode_mask_matches_dense_concat():
    """Ring-cache decode mask == reference concat mask with q_offset."""
    tpf, cached_tokens, q_len, S = 4, 24, 4, 32
    rel = jnp.mod(jnp.arange(S, dtype=jnp.int32) - 0, S)  # start=0 ring
    got = np.asarray(decode_mask_from_cache(
        rel, jnp.int32(cached_tokens), q_len, tpf, 3, True))
    # equivalent dense mask over concatenated stream
    want_concat = oracle(cached_tokens + q_len, tpf, 3, None,
                         cached_tokens, True)
    # got columns: [S ring slots | q_len new]; ring slot i == stream pos i
    # for i < cached_tokens, else invalid
    np.testing.assert_array_equal(got[:, :cached_tokens],
                                  want_concat[:, :cached_tokens])
    assert not got[:, cached_tokens:S].any()  # invalid slots masked
    np.testing.assert_array_equal(got[:, S:], want_concat[:, cached_tokens:])


def test_decode_mask_ring_wrap():
    """Slots keep correct insertion order after the ring wraps."""
    tpf, S = 2, 8
    start = 6
    length = jnp.int32(6)
    rel = jnp.mod(jnp.arange(S, dtype=jnp.int32) - start, S)
    got = np.asarray(decode_mask_from_cache(rel, length, 2, tpf, None, True))
    # slot 6 is oldest (rel 0), slot 5 newest valid (rel 5); slots rel>=6 invalid
    assert got[0, 6] and got[0, 7] and got[0, 0]
    assert not got[0, 4] and not got[0, 5]  # rel 6,7 -> invalid
    assert got[:, S:].all()  # new tokens visible (same frame)
