"""Pallas kernels vs their XLA reference implementations.

Runs everywhere: on CPU the kernels execute in Pallas interpret mode
(same program, emulated), on TPU they compile through Mosaic. The XLA
references are themselves golden-tested elsewhere (test_sparse.py,
test_column_sparse.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.ops import column_sparse as csp
from vision3d_tpu.ops import sparse as sp
from vision3d_tpu.ops.pallas.column_conv import column_conv_pallas
from vision3d_tpu.ops.pallas.zwin_conv import (
    conv_zwin_apply_pallas,
    conv_zwin_apply_pallas2,
    conv_zwin_apply_pallas3,
)


@pytest.mark.parametrize("c,cout", [(4, 16), (32, 32), (64, 64)])
def test_zwin_conv_pallas3_matches_xla(rng, c, cout):
    B, N, C, M = 2, 300, c, 260
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    start = jnp.asarray(rng.integers(0, N + 1, (B, M * 9)).astype(np.int32))
    pattern = jnp.where(
        start == N, 0,
        jnp.asarray(rng.integers(0, 8, (B, M * 9)).astype(np.int32)),
    )
    w = jnp.asarray(rng.normal(size=(27 * C, cout)), jnp.float32)
    ref = sp.conv_zwin_apply(feats, start, pattern, w, (3, 3, 3),
                             compute_dtype=jnp.bfloat16)
    got = conv_zwin_apply_pallas3(feats, start, pattern, w, (3, 3, 3),
                                  block_sites=128)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale, rtol=2e-2)


@pytest.mark.parametrize("c,cout", [(4, 16), (16, 32), (32, 32)])
def test_zwin_conv_pallas2_matches_xla(rng, c, cout):
    B, N, C, M = 2, 300, c, 260
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    start = jnp.asarray(rng.integers(0, N + 1, (B, M * 9)).astype(np.int32))
    pattern = jnp.where(
        start == N, 0,
        jnp.asarray(rng.integers(0, 8, (B, M * 9)).astype(np.int32)),
    )
    w = jnp.asarray(rng.normal(size=(27 * C, cout)), jnp.float32)
    ref = sp.conv_zwin_apply(feats, start, pattern, w, (3, 3, 3),
                             compute_dtype=jnp.bfloat16)
    got = conv_zwin_apply_pallas2(feats, start, pattern, w, (3, 3, 3),
                                  block_sites=128)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale, rtol=2e-2)


@pytest.mark.parametrize("cout", [16, 32])
def test_zwin_conv_pallas_matches_xla(rng, cout):
    B, N, C, M = 2, 300, 16, 260
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    start = jnp.asarray(rng.integers(0, N + 1, (B, M * 9)).astype(np.int32))
    pattern = jnp.where(
        start == N, 0,
        jnp.asarray(rng.integers(0, 8, (B, M * 9)).astype(np.int32)),
    )
    w = jnp.asarray(rng.normal(size=(27 * C, cout)), jnp.float32)
    ref = sp.conv_zwin_apply(feats, start, pattern, w, (3, 3, 3),
                             compute_dtype=jnp.bfloat16)
    got = conv_zwin_apply_pallas(feats, start, pattern, w, (3, 3, 3))
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale, rtol=2e-2)


@pytest.mark.parametrize("sz,pz", [(1, 1), (2, 1)])
def test_column_conv_pallas_matches_xla(rng, sz, pz):
    B, N, D, C, Cout, M = 2, 200, 21, 32, 32, 130
    cf = jnp.asarray(rng.normal(size=(B, N, D * C)), jnp.bfloat16)
    rb = jnp.asarray(rng.integers(0, N + 1, (B, M * 9)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(27 * C, Cout)), jnp.float32)
    ref = csp.column_conv_batched(cf, rb, w, (3, 3, 3), D, C, sz, pz,
                                  compute_dtype=jnp.bfloat16)
    got = column_conv_pallas(cf, rb, w, (3, 3, 3), D, C, sz, pz,
                             block_cols=128)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale, rtol=2e-2)


def test_compact_rulebooks_match_csr(rng):
    """build_col_compact rulebooks == dense-CSR rulebooks on random sets."""
    B, N = 3, 500
    grid = (12, 40, 36)
    d, h, w = grid
    keys, mask = [], []
    for _ in range(B):
        nact = int(rng.integers(300, 480))
        k = np.sort(rng.choice(d * h * w, nact, replace=False)).astype(np.int32)
        k = np.concatenate([k, np.full(N - nact, d * h * w, np.int32)])
        keys.append(k)
        mask.append(np.arange(N) < nact)
    keys = jnp.asarray(np.stack(keys))
    mask = jnp.asarray(np.stack(mask))

    ok_, om_, nd_ = jax.vmap(lambda kk, mm: sp.downsample_active_set(
        kk, mm, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 400))(keys, mask)
    og = sp.out_grid_shape(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    # k3s2p0: exercises dense-shift's high-side pad clamp (py_hi/px_hi > 0)
    ok0, om0, nd0 = jax.vmap(lambda kk, mm: sp.downsample_active_set(
        kk, mm, grid, (3, 3, 3), (2, 2, 2), (0, 0, 0), 400))(keys, mask)
    og0 = sp.out_grid_shape(grid, (3, 3, 3), (2, 2, 2), (0, 0, 0))
    nd_by_pad = {(1, 1, 1): nd_, (0, 0, 0): nd0}

    rec = sp.build_csr(keys, mask, grid)
    t4c, slotmap, _, ncdrop, col_cell = sp.build_col_compact(keys, mask, grid, 400)
    assert int(np.asarray(ncdrop).sum()) == 0
    img = sp.dense_record_image(t4c, col_cell, grid)

    for outk, outm, outg, st, pd in [
        (keys, mask, grid, (1, 1, 1), (1, 1, 1)),
        (ok_, om_, og, (2, 2, 2), (1, 1, 1)),
        (ok0, om0, og0, (2, 2, 2), (0, 0, 0)),
    ]:
        s1, p1 = sp.csr_zwin_rulebook(rec, N, grid, outk, outm, outg,
                                      (3, 3, 3), st, pd)
        s2, p2 = sp.zwin_rulebook_compact(t4c, slotmap, N, grid, outk, outm,
                                          outg, (3, 3, 3), st, pd)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        s3, p3, cdrop = sp.zwin_rulebook_cached(
            t4c, slotmap, N, grid, outk, outm, outg, (3, 3, 3), st, pd)
        assert int(np.asarray(cdrop).sum()) == 0
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))
        # production path on mid-size BEV grids (plan_stage_batched first
        # branch): dense record image + shifted-slice rulebook, both with
        # its own image build and with a stage-shared one
        for im in (None, img):
            s5, p5 = sp.zwin_rulebook_dense_shift(
                t4c, col_cell, N, grid, outk, outm, outg, (3, 3, 3), st,
                pd, img=im)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s5))
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p5))
        if st != (1, 1, 1):
            # stack-derived output set + rulebook from the SAME stack
            # (the plan_stage_batched dense-shift branch wiring)
            stack = sp.dense_shift_stack(img, grid, outg, (3, 3, 3), st,
                                         pd)
            ok6, om6, nd6 = sp.downsample_from_stack(
                stack, grid[0], outg, (3, 3, 3), st, pd, 400)
            np.testing.assert_array_equal(np.asarray(nd_by_pad[pd]),
                                          np.asarray(nd6))
            np.testing.assert_array_equal(np.asarray(outk), np.asarray(ok6))
            np.testing.assert_array_equal(np.asarray(outm), np.asarray(om6))
            s6, p6 = sp.zwin_rulebook_dense_shift(
                t4c, col_cell, N, grid, ok6, om6, outg, (3, 3, 3), st,
                pd, stack=stack)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s6))
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p6))
        if st != (1, 1, 1):
            s4, p4, cdrop4 = sp.zwin_rulebook_down_scatter(
                t4c, col_cell, N, grid, outk, outm, outg, (3, 3, 3), st,
                pd)
            assert int(np.asarray(cdrop4).sum()) == 0
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s4))
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p4))
        r1 = sp.csr_rulebook(rec, N, grid, outk, outm, outg, (3, 3, 3),
                             st, pd)
        r2 = sp.rulebook_compact(t4c, slotmap, N, grid, outk, outm, outg,
                                 (3, 3, 3), st, pd)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_downsample_from_stack_truncation(rng):
    """Capacity overflow: stack-derived downsample must keep the SAME
    ascending-key prefix (largest-key truncation) as downsample_active_set
    and report identical drop counts."""
    B, N = 2, 400
    grid = (12, 40, 36)
    d, h, w = grid
    keys, mask = [], []
    for _ in range(B):
        nact = int(rng.integers(320, 400))
        k = np.sort(rng.choice(d * h * w, nact, replace=False)).astype(np.int32)
        k = np.concatenate([k, np.full(N - nact, d * h * w, np.int32)])
        keys.append(k)
        mask.append(np.arange(N) < nact)
    keys = jnp.asarray(np.stack(keys))
    mask = jnp.asarray(np.stack(mask))
    cap = 150  # well below the dilated active-set size -> forced drops

    ok_, om_, nd_ = jax.vmap(lambda kk, mm: sp.downsample_active_set(
        kk, mm, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), cap))(keys, mask)
    og = sp.out_grid_shape(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))

    t4c, _, _, _, col_cell = sp.build_col_compact(keys, mask, grid, N,
                                                  want_slotmap=False)
    img = sp.dense_record_image(t4c, col_cell, grid)
    stack = sp.dense_shift_stack(img, grid, og, (3, 3, 3), (2, 2, 2),
                                 (1, 1, 1))
    ok6, om6, nd6 = sp.downsample_from_stack(
        stack, grid[0], og, (3, 3, 3), (2, 2, 2), (1, 1, 1), cap)
    assert int(np.asarray(nd6).sum()) > 0
    np.testing.assert_array_equal(np.asarray(nd_), np.asarray(nd6))
    np.testing.assert_array_equal(np.asarray(ok_), np.asarray(ok6))
    np.testing.assert_array_equal(np.asarray(om_), np.asarray(om6))


def test_dense_from_sparse_cols_matches_direct(rng):
    """Column-route densify == direct per-cell densify on random sets."""
    from vision3d_tpu.models import sparse_cnn as scnn

    B, N, C = 3, 400, 16
    grid = (12, 40, 36)
    d, h, w = grid
    keys, mask, feats = [], [], []
    for _ in range(B):
        nact = int(rng.integers(250, 380))
        k = np.sort(rng.choice(d * h * w, nact, replace=False)).astype(np.int32)
        k = np.concatenate([k, np.full(N - nact, d * h * w, np.int32)])
        keys.append(k)
        mask.append(np.arange(N) < nact)
        feats.append(rng.normal(size=(N, C)).astype(np.float32))
    st = scnn.SparseTensor(
        feats=jnp.asarray(np.stack(feats)) * jnp.asarray(np.stack(mask))[..., None],
        keys=jnp.asarray(np.stack(keys)),
        mask=jnp.asarray(np.stack(mask)),
        grid=grid,
    )
    ref = scnn.dense_from_sparse(st, keep_keys=True)
    got, cdrop = scnn.dense_from_sparse_cols(st, keep_keys=True, ncol_cap=380)
    assert int(np.asarray(cdrop).sum()) == 0
    assert got.hwdc and not ref.hwdc
    np.testing.assert_array_equal(np.asarray(ref.occ), np.asarray(got.occ))
    got_zmajor = np.transpose(np.asarray(got.feats), (0, 3, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(ref.feats), got_zmajor, atol=1e-6)

    # to_voxel_sparse must invert either layout identically
    np.testing.assert_allclose(
        np.asarray(ref.to_voxel_sparse().feats),
        np.asarray(got.to_voxel_sparse().feats), atol=1e-6)

    # the first dense conv consumes the hwdc layout via dimension_numbers:
    # conv(hwdc input) == conv(z-major input), both NDHWC out
    C2 = 8
    wconv = jnp.asarray(
        rng.normal(size=(27 * C, C2)).astype(np.float32))
    for stride, pad in (((1, 1, 1), (1, 1, 1)), ((2, 2, 2), (0, 1, 1))):
        o_ref = scnn._dense_conv(ref.feats, wconv, (3, 3, 3), stride, pad,
                                 jnp.float32)
        o_hwdc = scnn._dense_conv(got.feats, wconv, (3, 3, 3), stride, pad,
                                  jnp.float32, in_hwdc=True)
        np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_hwdc),
                                   atol=1e-4)
