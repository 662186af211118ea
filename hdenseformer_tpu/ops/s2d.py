"""Space-to-depth packed convolution: the TPU-native layout for narrow-
channel conv stages.

The v5e MXU consumes 128-lane operands; the reference's full-resolution
stages run 32/64 channels (models/HDenseFormer.py:237-244), which XLA
pads 32->128, reaching ~10 TF/s of the chip's 123 TF/s matmul ceiling
(baselines/profile_notes.md). This module re-lays those stages out
space-to-depth: each 2^d fine-grid block becomes a channel group, so a
144^3 x 32ch activation flows as 72^3 x 256ch — fully lane-aligned.

Packed order is PARITY-MAJOR: packed index = p * C + c, where p is the
fine-offset bit pattern (p_z p_y p_x) and c the original channel. This
makes every per-parity channel block a CONTIGUOUS lane range, and the
half-shift gather (``plain_to_shifted``) is POSITION-PRESERVING (block p
copies block p from a shifted cell; the block bookkeeping is folded into
``expand_kernel``'s tap factor) — zero lane movement, vs the stride-2^d
lane gathers of a channel-major order (the first cut of this module
benchmarked SLOWER end-to-end for exactly that reason).

Under this layout:

- a SAME 3^d conv on the fine grid == a VALID 2^d conv on the coarse grid
  with a structurally-expanded kernel (``expand_kernel``) applied to the
  half-shifted packing. Exact same sums, different order — measured 2.4x
  faster fwd+bwd at 144^3 x 32ch on v5e in isolation. The shift operand
  itself never needs materializing for a conv PAIR: ``conv3_packed_p2s``
  emits the half-shifted layout directly (plain input, per-dim padding
  (1,1), ``expand_kernel_p2s``) and ``conv3_packed_s2p`` consumes it, so
  conv -> norm -> conv chains run with zero shift copies (the shift
  concats were ~55 ms of the round-3 144^3 train step) — the norm in
  between masks the out-of-grid slots (``shifted_mask_factors``);
- a k2 s2 maxpool == a max over the p axis (``max_pool_packed``) — this
  also eliminates XLA's 3-D select-and-scatter backward (29 ms/step in
  the round-1 profile);
- a k3 s2 p1 op1 ConvTranspose (decoder upsample,
  models/HDenseFormer.py:211-219) == a VALID k2 conv from the coarse grid
  into packed fine channels (``conv_transpose_packed``) — no input
  dilation at all;
- a 1^d conv (deep-supervision heads) == ONE matmul with a
  block-diagonal expanded weight (``conv1_packed``) — no data reshuffle;
- InstanceNorm (``instance_norm_relu_packed``) reduces over spatial only,
  then regroups the per-packed-channel moments on a length-2^d*C vector —
  the (c, p) regroup never touches the activation tensor.

The expansion carries a 2^(2d)*2^d/3^d FLOP redundancy (2.37x for d=3:
64 dense vs 27 useful taps) but runs at full MXU utilization, a large
net win below 128 channels. All ops are plain XLA (conv_general_dilated/
reshape/slice), so autodiff, jit, pjit sharding and CPU tests work
unchanged.

PARTIAL-RANK packing: every op takes a ``dims`` tuple selecting WHICH
spatial dims are packed (default: all). Packing only the LAST spatial
dim doubles the channel count at 4/3x FLOP redundancy (4 dense vs 3
useful taps on that axis) — the right trade for 64-channel stages,
where a full-rank pack's 2.37x redundancy outweighs the lane win
(measured, PARITY.md round-2) but 64 -> 128 lanes at 4/3x does not.
Because the last spatial dim is adjacent to the channel dim,
``pack``/``unpack`` along it are contiguous reshapes — zero data
movement. Unpacked dims keep their 3-tap SAME convolution; packed dims
run the 2-tap VALID form.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _dim_numbers(nsp: int):
    if nsp == 2:
        return ("NHWC", "HWIO", "NHWC")
    if nsp == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported spatial rank {nsp}")


def _pdims(nsp: int, dims) -> tuple:
    """Normalize the packed-dims selector: None = all spatial dims."""
    if dims is None:
        return tuple(range(nsp))
    dims = tuple(sorted(int(d) for d in dims))
    assert dims and len(set(dims)) == len(dims)
    assert all(0 <= d < nsp for d in dims), (dims, nsp)
    return dims


@lru_cache(maxsize=None)
def _tap_factor(transpose: bool) -> np.ndarray:
    """Per-dimension factor A[u, p, q, k].

    Forward (SAME k3): shifted cell j+u (u in {0,1}), block POSITION p
    holds fine position 2(j+u) - p (``plain_to_shifted`` stores block p
    from source cell j - p — position-preserving, zero lane movement);
    output fine position 2j + q needs kernel tap t = (2u - p) - q in
    {-1, 0, 1}, i.e. kernel index k = t + 1 = 2u - p - q + 1.

    Transpose (torch ConvTranspose k3 s2 p1 op1): output fine position
    o = 2j + q receives in[i] * w[k] where o = 2i + k - 1; with coarse
    input cell i = j + u (u in {0,1}) that is k = q - 2u + 1.
    """
    A = np.zeros((2, 2, 2, 3), np.float32)
    for u in range(2):
        for p in range(2):
            for q in range(2):
                k = (q - 2 * u + 1) if transpose else (2 * u - p - q + 1)
                if transpose and p != 0:
                    continue  # transpose input is unpacked: only p=0 used
                if 0 <= k <= 2:
                    A[u, p, q, k] = 1.0
    return A


@lru_cache(maxsize=None)
def _tap_factor_p2s() -> np.ndarray:
    """Per-dimension factor A2[u, q_in, p_out, k] for the plain->SHIFTED
    conv form (``conv3_packed_p2s``).

    Output shifted slot (j, p) is fine position 2j - p; the fine SAME-k3
    conv needs in_fine[2j - p + k - 1] = plain cell m block q with
    q = (p + k - 1) mod 2 and m - j = (k - 1 - p - q) / 2 in {-1, 0},
    i.e. conv tap u = (m - j) + 1 under per-dim padding (1, 1).

    Same 6 nonzero (p, k) entries per dim as the forward factor — the
    p2s and s2p forms carry identical 2.37x FLOP redundancy; what p2s
    buys is that its OUTPUT is exactly the half-shifted operand the next
    ``conv3_packed_s2p`` consumes, so the chain conv->IN->conv executes
    with ZERO shift materializations (the round-3 trace put ~55 ms/step
    of the 144^3 train step in shift concats, baselines/profile_notes.md).
    """
    A = np.zeros((2, 2, 2, 3), np.float32)
    for p in range(2):
        for k in range(3):
            q = (p + k - 1) % 2
            u = (k - 1 - p - q) // 2 + 1
            assert (k - 1 - p - q) % 2 == 0 and 0 <= u <= 1
            A[u, q, p, k] = 1.0
    return A


@lru_cache(maxsize=None)
def _id_factor() -> np.ndarray:
    """Unpacked-dim factor: the 3 kernel taps pass through as 3 spatial
    taps (singleton block axes) — that dim keeps its SAME-3 convolution."""
    ident = np.zeros((3, 1, 1, 3), np.float32)
    for k in range(3):
        ident[k, 0, 0, k] = 1.0
    return ident


def _expand_with(w: Array, dims, packed_factor: np.ndarray) -> Array:
    nsp = w.ndim - 2
    dims = _pdims(nsp, dims)
    fs = [
        jnp.asarray(packed_factor if i in dims else _id_factor(), w.dtype)
        for i in range(nsp)
    ]
    if nsp == 3:
        Wp = jnp.einsum("aPQk,bRSl,cTUm,klmio->abcPRTiQSUo", *fs, w)
    else:
        Wp = jnp.einsum("aPQk,bRSl,klio->abPRiQSo", *fs, w)
    C, Co = w.shape[-2], w.shape[-1]
    f = 2 ** len(dims)
    ksp = tuple(2 if i in dims else 3 for i in range(nsp))
    return Wp.reshape(ksp + (f * C, f * Co))


def expand_kernel(w: Array, dims=None) -> Array:
    """(3,..,3, C, Co) fine SAME-conv kernel -> packed VALID-conv kernel
    (parity-major packed order): 2 taps / 2^|dims| channel blocks on the
    packed dims, the original 3 SAME taps on unpacked dims."""
    return _expand_with(w, dims, _tap_factor(False))


def expand_kernel_p2s(w: Array, dims=None) -> Array:
    """(3,..,3, C, Co) fine SAME-conv kernel -> packed kernel for the
    plain->shifted conv form (``conv3_packed_p2s``)."""
    return _expand_with(w, dims, _tap_factor_p2s())


def expand_kernel_transpose(w: Array, dims=None) -> Array:
    """torch-layout ConvTranspose kernel, already converted to the
    equivalent-conv form used by models/layers.py::ConvTranspose
    ((3,..,3, C_in, C_out), spatially flipped) -> (2,..,2, C_in, 2^d*C_out)
    packed kernel: a VALID k2 coarse conv producing packed fine outputs.

    models/layers.py stores the transposed conv as an equivalent dilated
    conv whose kernel is the flipped torch kernel; un-flip to recover
    w_t[k] and apply o = 2i + k - 1 (k3 s2 p1 op1, ref
    models/HDenseFormer.py:211-219).

    Partial-rank (``dims``): only the packed dims are un-flipped and
    expanded; unpacked dims keep the stored equivalent-conv orientation —
    they run as the usual input-dilated (lhs_dilation=2) taps.
    """
    nsp = w.ndim - 2
    dims = _pdims(nsp, dims)
    wt = jnp.flip(w, axis=dims)  # packed dims back to torch tap order
    A = _tap_factor(True)[:, 0]  # (u, q, k)
    identu = np.zeros((3, 1, 3), np.float32)
    for k in range(3):
        identu[k, 0, k] = 1.0
    fs = [jnp.asarray(A if i in dims else identu, w.dtype) for i in range(nsp)]
    if nsp == 3:
        Wp = jnp.einsum("aQk,bSl,cUm,klmio->abciQSUo", *fs, wt)
    else:
        Wp = jnp.einsum("aQk,bSl,klio->abiQSo", *fs, wt)
    C, Co = w.shape[-2], w.shape[-1]
    ksp = tuple(2 if i in dims else 3 for i in range(nsp))
    return Wp.reshape(ksp + (C, (2 ** len(dims)) * Co))


def pack(x: Array, dims=None) -> Array:
    """(N, *fine, C) -> packed-plain, parity-major: packed dims halve and
    contribute channel-block bits in dim order. Packing only the last
    spatial dim is a contiguous reshape (zero data movement)."""
    nsp = x.ndim - 2
    dims = _pdims(nsp, dims)
    n, c = x.shape[0], x.shape[-1]
    shape = (n,)
    for i, s in enumerate(x.shape[1:-1]):
        shape += (s // 2, 2) if i in dims else (s,)
    shape += (c,)
    xp = x.reshape(shape)
    # spatial axes (coarse part), then parity axes in dim order, then c
    spat, par = [], []
    pos = 1
    for i in range(nsp):
        spat.append(pos)
        if i in dims:
            par.append(pos + 1)
            pos += 2
        else:
            pos += 1
    xp = xp.transpose((0,) + tuple(spat) + tuple(par) + (pos,))
    g = tuple(s // 2 if i in dims else s for i, s in enumerate(x.shape[1:-1]))
    return xp.reshape((n,) + g + (c * 2 ** len(dims),))


def unpack(xp: Array, dims=None) -> Array:
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    n, cf = xp.shape[0], xp.shape[-1]
    f = 2 ** len(dims)
    c = cf // f
    g = xp.shape[1:-1]
    x = xp.reshape((n,) + tuple(g) + (2,) * len(dims) + (c,))
    # (n, g..., p..., c) -> interleave each packed dim with its parity axis
    perm = (0,)
    pi = 1 + nsp
    for i in range(nsp):
        perm += (1 + i,)
        if i in dims:
            perm += (pi,)
            pi += 1
    perm += (1 + nsp + len(dims),)
    x = x.transpose(perm)
    fine = tuple(2 * s if i in dims else s for i, s in enumerate(g))
    return x.reshape((n,) + fine + (c,))


def plain_to_shifted(xp: Array, dims=None) -> Array:
    """Packed-plain (cells cover fine [2j, 2j+1]) -> packed-shifted
    (one extra cell per packed dim, zero-padded boundary == the fine
    conv's SAME padding): shifted cell j, block p holds fine 2j - p.

    POSITION-PRESERVING: block p copies block p (the identical contiguous
    C-channel lane range) from the neighbor cell j - p — zero lane
    movement; the block bookkeeping lives entirely in ``expand_kernel``'s
    tap factor. This is what lets ``ops/shift_pack.py`` phrase the op as
    full-128-lane plane copies with lane-masked plane/shift selection.
    """
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    npk = len(dims)
    n, cf = xp.shape[0], xp.shape[-1]
    f = 2 ** npk
    c = cf // f
    g = xp.shape[1:-1]
    pad = ((0, 0),) + tuple(
        (1, 1) if i in dims else (0, 0) for i in range(nsp)
    ) + ((0, 0),)
    xr = jnp.pad(xp, pad)
    pieces = []
    for mask in range(f):
        pbits = {
            d: (mask >> (npk - 1 - j)) & 1 for j, d in enumerate(dims)
        }
        idx = (slice(None),)
        for i in range(nsp):
            if i in dims:
                pb = pbits[i]
                # padded coords: j in [-1, g]; want source j - pb for
                # shifted j in [0, g], i.e. padded range [1-pb, 1-pb+g+1)
                idx += (slice(1 - pb, 1 - pb + g[i] + 1),)
            else:
                idx += (slice(None),)
        idx += (slice(mask * c, (mask + 1) * c),)
        pieces.append(xr[idx])
    return jnp.concatenate(pieces, axis=-1)


def conv3_packed(xp: Array, w: Array, dtype=None, dims=None) -> Array:
    """SAME 3^d conv on the fine grid, computed in packed space.

    xp: packed-plain (N, *g, f*C); w: fine kernel (3,..,3, C, Co).
    Returns packed-plain (N, *g, f*Co).
    """
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xp.dtype
    if len(dims) == nsp:
        # shift_pack is a residual-free custom_vjp (the op is linear): no
        # second (g+1)^d x 2^d C residual is kept alive per conv (~200 MB
        # each at 144^3 x 32ch), and no backward-pass recompute either.
        # Cast BEFORE the shift: halves the copy's traffic when the input
        # is f32 and keeps the pallas kernel on bf16 blocks.
        from hdenseformer_tpu.ops.shift_pack import shift_pack

        xs = shift_pack(xp.astype(dt))
    else:
        xs = plain_to_shifted(xp.astype(dt), dims)
    wexp = expand_kernel(w, dims).astype(dt)
    pad = [(0, 0) if i in dims else (1, 1) for i in range(nsp)]
    return jax.lax.conv_general_dilated(
        xs, wexp, (1,) * nsp, pad,
        dimension_numbers=_dim_numbers(nsp),
    )


def conv3_packed_p2s(xp: Array, w: Array, dtype=None, dims=None) -> Array:
    """SAME 3^d fine conv, packed-plain input -> packed-SHIFTED output.

    Output slot (cell j, block p) holds fine position 2j - p over
    j in [0, g] (g+1 cells per packed dim). Slots outside the fine grid
    (per packed dim: j=0 with p=1, j=g with p=0) hold conv garbage and
    MUST be zero-masked by the consumer
    (``ops.fused_norm.instance_norm_relu(shifted=...)`` does;
    ``shifted_mask_factors`` builds the mask) before the values are read
    as zero padding by ``conv3_packed_s2p``.
    """
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xp.dtype
    wexp = expand_kernel_p2s(w, dims).astype(dt)
    return jax.lax.conv_general_dilated(
        xp.astype(dt), wexp, (1,) * nsp, [(1, 1)] * nsp,
        dimension_numbers=_dim_numbers(nsp),
    )


def conv3_packed_s2p(xs: Array, w: Array, dtype=None, dims=None) -> Array:
    """SAME 3^d fine conv, packed-SHIFTED input -> packed-plain output.

    The input is what ``conv3_packed_p2s`` (after pad masking) or
    ``plain_to_shifted`` produces; this is ``conv3_packed`` minus the
    shift — a VALID 2-tap conv on packed dims, SAME 3-tap on the rest.
    """
    nsp = xs.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xs.dtype
    wexp = expand_kernel(w, dims).astype(dt)
    pad = [(0, 0) if i in dims else (1, 1) for i in range(nsp)]
    return jax.lax.conv_general_dilated(
        xs.astype(dt), wexp, (1,) * nsp, pad,
        dimension_numbers=_dim_numbers(nsp),
    )


@lru_cache(maxsize=None)
def shifted_mask_factors(sshape: tuple, fc: int, c: int, dims: tuple = None):
    """Per-PACKED-dim (dim_index, (s_i, fC) float32 {0,1} factor) pairs
    whose broadcast product masks the out-of-grid slots of a
    packed-shifted tensor: slot (j, p) is a pad iff per some packed dim
    (j == 0 and p-bit == 1) or (j == s-1 and p-bit == 0). ``sshape`` is
    the SHIFTED tensor's spatial shape. Kept factored (a few KB each) so
    XLA fuses the masking multiplies into neighboring elementwise work
    instead of materializing a full-resolution mask."""
    nsp = len(sshape)
    dims = _pdims(nsp, dims)
    npk = len(dims)
    pidx = np.arange(fc) // c
    out = []
    for j, i in enumerate(dims):
        b = (pidx >> (npk - 1 - j)) & 1
        m = np.ones((sshape[i], fc), np.float32)
        m[0, b == 1] = 0.0
        m[sshape[i] - 1, b == 0] = 0.0
        out.append((i, m))
    return tuple(out)


def apply_shifted_mask(y: Array, dtype=None, dims=None) -> Array:
    """Zero the pad slots of a packed-shifted tensor (broadcast product of
    ``shifted_mask_factors``; fuses into neighboring elementwise ops)."""
    nsp = y.ndim - 2
    dims = _pdims(nsp, dims)
    fc = y.shape[-1]
    c = fc // (2 ** len(dims))
    dt = dtype or y.dtype
    for i, m in shifted_mask_factors(tuple(y.shape[1:-1]), fc, c, dims):
        shape = (1,) * (1 + i) + (y.shape[1 + i],) + (1,) * (nsp - 1 - i) + (fc,)
        y = y * jnp.asarray(m, dt).reshape(shape)
    return y


@lru_cache(maxsize=None)
def _tap_factor_k(k: int):
    """Generalized per-dim factor for the shifted->plain (s2p) form of a
    SAME k-tap fine conv, k ODD (k=3 reproduces ``_tap_factor(False)``).

    Shifted cell j+u block p holds fine 2(j+u) - p; output fine 2j + q
    needs kernel tap t = 2u - p - q + (k-1)//2. Returns
    (A[u_idx, p, q, t], pad_lo, pad_hi): a VALID K-tap coarse conv over
    the (pad_lo, pad_hi)-zero-extended shifted tensor (g+1 cells) yields
    the g packed-plain output cells. This is what gives 7-tap kernels a
    packed lowering (VERDICT r4 item 5): k7 == VALID k4 coarse with
    pads (1, 1)."""
    assert k % 2 == 1, k
    half = (k - 1) // 2
    us = [
        u for u in range(-k, k + 1)
        if any(0 <= 2 * u - p - q + half < k for p in range(2) for q in range(2))
    ]
    u_min, u_max = min(us), max(us)
    K = u_max - u_min + 1
    A = np.zeros((K, 2, 2, k), np.float32)
    for u in range(u_min, u_max + 1):
        for p in range(2):
            for q in range(2):
                t = 2 * u - p - q + half
                if 0 <= t < k:
                    A[u - u_min, p, q, t] = 1.0
    return A, -u_min, u_max - 1


@lru_cache(maxsize=None)
def _tap_factor_p2s_k(k: int):
    """Generalized plain->SHIFTED factor (k odd; k=3 reproduces
    ``_tap_factor_p2s``). Output shifted slot (j, p) = fine 2j - p reads
    plain cell j + u block q with q = (t - half - p) mod 2,
    u = (t - half - p - q) // 2. Returns (A[u_idx, q, p, t], pad_lo,
    pad_hi) for a VALID K-tap conv over the padded g plain cells
    yielding g+1 shifted cells."""
    assert k % 2 == 1, k
    half = (k - 1) // 2
    entries = []
    for p in range(2):
        for t in range(k):
            s = t - half - p
            q = s % 2
            entries.append(((s - q) // 2, q, p, t))
    u_min = min(e[0] for e in entries)
    u_max = max(e[0] for e in entries)
    K = u_max - u_min + 1
    A = np.zeros((K, 2, 2, k), np.float32)
    for u, q, p, t in entries:
        A[u - u_min, q, p, t] = 1.0
    return A, -u_min, u_max + 1


@lru_cache(maxsize=None)
def _tap_factor_s2(k: int):
    """Per-dim factor for a STRIDE-2 SAME k-tap fine conv consumed from
    the packed-plain layout, emitting the UNPACKED coarse grid (the next
    level's fine grid — e.g. TransBTS EnDown, reference
    models/TransBTS/Unet_skipconnection.py:58-68). Output coarse j =
    fine 2j reads plain cell j + u block q with q = (t - half) mod 2 - …
    precisely: source fine 2j + t - half = 2(j+u) + q. Returns
    (A[u_idx, q, t], pad_lo, pad_hi) for a VALID K-tap coarse conv."""
    assert k % 2 == 1, k
    half = (k - 1) // 2
    entries = []
    for t in range(k):
        s = t - half
        q = s % 2
        entries.append(((s - q) // 2, q, t))
    u_min = min(e[0] for e in entries)
    u_max = max(e[0] for e in entries)
    K = u_max - u_min + 1
    A = np.zeros((K, 2, 1, k), np.float32)
    for u, q, t in entries:
        A[u - u_min, q, 0, t] = 1.0
    # VALID K conv over g cells padded (pad_lo, pad_hi) -> g//2… the
    # coarse output has ceil(g_fine/2)=g cells? No: stride-2 over fine 2g
    # with SAME pad yields g outputs == the number of plain cells, so
    # pads sum to K - 1.
    return A, -u_min, u_max


def _expand_general(w: Array, dims, factor_fn, out_packed: bool):
    """Expand a fine kernel with per-dim (A, pad_lo, pad_hi) factors on
    packed dims (identity 3-tap passthrough on unpacked dims). Returns
    (kernel, per-dim pads). ``out_packed=False`` drops the output parity
    axis (strided-s2 form)."""
    nsp = w.ndim - 2
    dims = _pdims(nsp, dims)
    k = w.shape[0]
    fs, pads = [], []
    for i in range(nsp):
        if i in dims:
            A, lo, hi = factor_fn(k)
            fs.append(jnp.asarray(A, w.dtype))
            pads.append((lo, hi))
        else:
            ident = np.zeros((k, 1, 1, k), np.float32)
            for t in range(k):
                ident[t, 0, 0, t] = 1.0
            fs.append(jnp.asarray(ident, w.dtype))
            pads.append((k // 2, k // 2))
    if nsp == 3:
        Wp = jnp.einsum("aPQk,bRSl,cTUm,klmio->abcPRTiQSUo", *fs, w)
    else:
        Wp = jnp.einsum("aPQk,bRSl,klio->abPRiQSo", *fs, w)
    C, Co = w.shape[-2], w.shape[-1]
    fin = int(np.prod([fs[i].shape[1] for i in range(nsp)]))
    fout = int(np.prod([fs[i].shape[2] for i in range(nsp)]))
    ksp = tuple(fs[i].shape[0] for i in range(nsp))
    return Wp.reshape(ksp + (fin * C, fout * Co)), pads


def convk_packed(xp: Array, w: Array, dtype=None, dims=None) -> Array:
    """SAME k-tap fine conv (k odd), packed-plain in -> packed-plain out —
    ``conv3_packed`` generalized to any odd k. The shifted operand is one
    extra cell per packed dim regardless of k; taps beyond the +-1-cell
    reach of the shifted layout come from zero-padding it (the fine
    conv's SAME padding), so k7 == a VALID k4 coarse conv with pads
    (1, 1) — this is what gives 7-tap stems a packed lowering (VERDICT
    r4 item 5, reference models/Hecktor20Top1/model.py:44-48)."""
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xp.dtype
    if w.shape[0] == 3:
        return conv3_packed(xp, w, dtype=dtype, dims=dims)
    if len(dims) == nsp:
        from hdenseformer_tpu.ops.shift_pack import shift_pack

        xs = shift_pack(xp.astype(dt))
    else:
        xs = plain_to_shifted(xp.astype(dt), dims)
    wexp, pads = _expand_general(w, dims, _tap_factor_k, True)
    return jax.lax.conv_general_dilated(
        xs, wexp.astype(dt), (1,) * nsp, pads,
        dimension_numbers=_dim_numbers(nsp),
    )


def convk_packed_p2s(xp: Array, w: Array, dtype=None, dims=None) -> Array:
    """SAME k-tap fine conv (k odd), packed-plain in -> packed-SHIFTED
    out — ``conv3_packed_p2s`` generalized to any odd k (k7 stems:
    reference models/Hecktor20Top1/model.py:44-85). Pad slots carry conv
    garbage and MUST be masked by the consumer, exactly like the k3
    form."""
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xp.dtype
    if w.shape[0] == 3:
        return conv3_packed_p2s(xp, w, dtype=dtype, dims=dims)
    wexp, pads = _expand_general(w, dims, _tap_factor_p2s_k, True)
    return jax.lax.conv_general_dilated(
        xp.astype(dt), wexp.astype(dt), (1,) * nsp, pads,
        dimension_numbers=_dim_numbers(nsp),
    )


def conv_s2_packed(
    xp: Array, w: Array, bias=None, dtype=None, dims=None
) -> Array:
    """STRIDE-2 SAME k-tap fine conv (k odd) consumed from packed-plain,
    emitting the UNPACKED coarse grid — the packed lowering of a
    strided-conv downsample (TransBTS EnDown1-3, reference
    Unet_skipconnection.py:58-68: Conv3d(k3, s2, p1)). Unpacked dims run
    the usual fine stride-2 conv."""
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or xp.dtype
    wexp, pads = _expand_general(w, dims, _tap_factor_s2, False)
    strides = tuple(1 if i in dims else 2 for i in range(nsp))
    y = jax.lax.conv_general_dilated(
        xp.astype(dt), wexp.astype(dt), strides, pads,
        dimension_numbers=_dim_numbers(nsp),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2_packed(x: Array, w: Array, bias=None, dtype=None, dims=None) -> Array:
    """torch ConvTranspose(k2, s2) fine upsample with packed-plain OUTPUT
    on the input grid: out_fine[2j + q] = x[j] @ w[q] — each fine output
    position reads exactly ONE tap, so the whole op is a single
    (C, 2^d*Co) matmul, zero data reshuffle (the TransBTS DeUp_Cat
    upsample, reference TransBTS_downsample8x_skipconnection.py:118-131).

    ``w`` is the torch-layout kernel converted to conv orientation by
    models/layers.py::ConvTranspose (spatially flipped): un-flip to
    recover w_t[q]. Unpacked dims are unsupported (dims must be all)."""
    nsp = x.ndim - 2
    dims = _pdims(nsp, dims)
    assert len(dims) == nsp, "conv_transpose2_packed requires full-rank dims"
    assert all(s == 2 for s in w.shape[:nsp]), w.shape
    C, Co = w.shape[-2], w.shape[-1]
    dt = dtype or x.dtype
    wt = jnp.flip(w, axis=tuple(range(nsp)))  # back to torch tap order
    f = 2 ** nsp
    # parity-major: block bits in dim order == index order of reshape
    wm = wt.reshape(f, C, Co).transpose(1, 0, 2).reshape(C, f * Co).astype(dt)
    y = dot_f32out(x.astype(dt), wm).astype(dt)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), f)
    return y


def group_norm_relu_packed(
    xp: Array,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    num_groups: int = 8,
    epsilon: float = 1e-5,
    relu: bool = True,
    dims=None,
    shifted: bool = False,
) -> Array:
    """GroupNorm(+affine)(+ReLU) over the fine grid, in packed space
    (torch GroupNorm semantics: stats per (sample, group) over
    (channels-in-group, spatial) — reference TransBTS
    Unet_skipconnection.py:38-44). Per-packed-channel spatial moments
    regroup to (group) on length-f*C vectors; the activation tensor is
    never reshuffled. ``shifted`` excludes the packed-SHIFTED pad slots
    from the statistics and re-zeroes them (conv chain:
    conv_p2s -> GN+ReLU -> conv_s2p)."""
    nsp = xp.ndim - 2
    pdims = _pdims(nsp, dims)
    f = 2 ** len(pdims)
    c = xp.shape[-1] // f
    g = num_groups
    cg = c // g
    x32 = xp.astype(jnp.float32)
    axes = tuple(range(1, xp.ndim - 1))
    if shifted:
        x32m = apply_shifted_mask(x32, dims=pdims)
        m = f
        for i, s in enumerate(xp.shape[1:-1]):
            m *= (s - 1) if i in pdims else s
    else:
        x32m = x32
        m = f
        for s in xp.shape[1:-1]:
            m *= s
    m_g = (m // f) * f * cg  # elements per (sample, group)
    s1 = jnp.sum(x32m, axis=axes)  # (N, f*C)
    s2 = jnp.sum(jnp.square(x32m), axis=axes)
    n = xp.shape[0]

    def to_group(v):
        return jnp.sum(v.reshape(n, f, g, cg), axis=(1, 3))  # (N, G)

    mean_g = to_group(s1) / m_g
    var_g = to_group(s2) / m_g - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + epsilon)

    def to_packed(v):  # (N, G) -> (N, f*C) broadcast
        return jnp.tile(jnp.repeat(v, cg, axis=-1), (1, f))

    shape = (n,) + (1,) * nsp + (f * c,)
    y = (x32 - to_packed(mean_g).reshape(shape)) * to_packed(inv_g).reshape(shape)
    if scale is not None:
        y = y * jnp.tile(scale.astype(jnp.float32), f)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), f)
    if relu:
        y = jnp.maximum(y, 0.0)
    if shifted:
        y = apply_shifted_mask(y, dims=pdims)
    return y.astype(xp.dtype)


def conv_transpose_packed(
    x: Array, w_equiv: Array, bias=None, dtype=None, dims=None
) -> Array:
    """torch ConvTranspose(k3, s2, p1, op1) fine upsample, packed output.

    x: UNPACKED coarse grid (N, *g, C); w_equiv: the equivalent-conv
    kernel stored by models/layers.py::ConvTranspose. Returns packed-plain
    on the coarse grid (packed dims; coarse taps {j, j+1}: pad high side
    one cell) and the input-dilated 2x fine grid (unpacked dims; the
    usual equivalent-conv lowering, models/layers.py:230).
    """
    nsp = x.ndim - 2
    dims = _pdims(nsp, dims)
    dt = dtype or x.dtype
    wexp = expand_kernel_transpose(w_equiv, dims).astype(dt)
    pad = [(0, 1) if i in dims else (1, 2) for i in range(nsp)]
    lhs_dil = tuple(1 if i in dims else 2 for i in range(nsp))
    y = jax.lax.conv_general_dilated(
        x.astype(dt), wexp, (1,) * nsp, pad, lhs_dilation=lhs_dil,
        dimension_numbers=_dim_numbers(nsp),
    )
    if bias is not None:
        f = 2 ** len(dims)
        y = y + jnp.tile(bias.astype(y.dtype), f)
    return y


@jax.custom_vjp
def dot_f32out(x: Array, w: Array) -> Array:
    """Channel matmul reading x/w in their (bf16) compute dtype with f32
    MXU accumulation and f32 output — the logits-head primitive.

    Plain ``preferred_element_type=f32`` breaks under autodiff (the
    transposed op mixes the f32 cotangent with the bf16 kernel, which
    conv/dot reject); this custom VJP casts the cotangent back to the
    compute dtype for both backward products — the same rounding every
    other bf16 layer's gradient already undergoes.
    """
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_f32out_fwd(x, w):
    return dot_f32out(x, w), (x, w)


def _dot_f32out_bwd(res, dy):
    x, w = res
    dyc = dy.astype(x.dtype)
    dx = jax.lax.dot_general(
        dyc, w, (((dyc.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    xm = x.reshape(-1, x.shape[-1])
    dym = dyc.reshape(-1, dyc.shape[-1])
    dw = jax.lax.dot_general(
        xm, dym, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


dot_f32out.defvjp(_dot_f32out_fwd, _dot_f32out_bwd)


def conv1_packed(xp: Array, w1: Array, bias=None, dims=None) -> Array:
    """1^d conv (e.g. a deep-supervision head) in packed space, f32 out.

    Lowered as ONE (2^d C, 2^d Co) matmul with a block-diagonal expanded
    weight — no activation reshuffling at all. The dot runs in the
    activation dtype with f32 MXU accumulation (preferred_element_type):
    casting the full-resolution activation to f32 first materialized
    ~600 MB/step of extra traffic at 144^3 (round-3 trace) for precision
    the f32 accumulate already provides; output and bias stay f32.
    """
    nsp = xp.ndim - 2
    f = 2 ** len(_pdims(nsp, dims))
    c = xp.shape[-1] // f
    co = w1.shape[-1]
    w = w1.reshape(c, co).astype(xp.dtype)
    eye = jnp.eye(f, dtype=xp.dtype)
    wexp = jnp.einsum("pq,co->pcqo", eye, w).reshape(f * c, f * co)
    y = dot_f32out(xp, wexp)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), f)
    return y


def max_pool_packed(xp: Array, dims=None) -> Array:
    """k2 s2 maxpool of the fine grid == a max over the p axis (packed
    dims) + a pairwise spatial max (unpacked dims). Returns the UNPACKED
    coarse grid (which is the next stage's fine grid)."""
    nsp = xp.ndim - 2
    dims = _pdims(nsp, dims)
    f = 2 ** len(dims)
    c = xp.shape[-1] // f
    xr = xp.reshape(xp.shape[:-1] + (f, c))
    y = jnp.max(xr, axis=-2)
    for i in range(nsp):
        if i in dims:
            continue
        ax = 1 + i
        s = y.shape[ax]
        if s % 2:  # torch MaxPool VALID semantics: truncate the odd tail
            y = jax.lax.slice_in_dim(y, 0, s - 1, axis=ax)
            s -= 1
        y = jnp.max(
            y.reshape(y.shape[:ax] + (s // 2, 2) + y.shape[ax + 1:]),
            axis=ax + 1,
        )
    return y


def instance_norm_relu_packed(
    xp: Array,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    epsilon: float = 1e-5,
    relu: bool = True,
    dims=None,
) -> Array:
    """InstanceNorm(+affine)+ReLU over the fine grid, in packed space.

    Statistics per (sample, original channel) reduce over (spatial, p) —
    computed as per-PACKED-channel spatial moments (a standard lane-wise
    reduction) followed by the (p, c) regroup on the length-f*C moment
    vectors, so the activation tensor itself is never reshuffled.
    """
    nsp = xp.ndim - 2
    f = 2 ** len(_pdims(nsp, dims))
    c = xp.shape[-1] // f
    x32 = xp.astype(jnp.float32)
    axes = tuple(range(1, xp.ndim - 1))
    m1 = jnp.mean(x32, axis=axes)  # (N, f*C) per packed channel
    m2 = jnp.mean(jnp.square(x32), axis=axes)
    mean_c = jnp.mean(m1.reshape(-1, f, c), axis=1)  # (N, C)
    m2_c = jnp.mean(m2.reshape(-1, f, c), axis=1)
    var_c = m2_c - jnp.square(mean_c)
    mean = jnp.tile(mean_c, (1, f))  # back to packed channels
    inv = jnp.tile(jax.lax.rsqrt(var_c + epsilon), (1, f))
    shape = (xp.shape[0],) + (1,) * nsp + (f * c,)
    y = (x32 - mean.reshape(shape)) * inv.reshape(shape)
    if scale is not None:
        y = y * jnp.tile(scale.astype(jnp.float32), f)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), f)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(xp.dtype)


def upsample2x_packed(x: Array, dims=None) -> Array:
    """x2 half-pixel linear upsample (torch ``align_corners=False``), with
    the fine output emitted directly in packed-plain layout.

    Per dim: out_fine[2j] = 0.25 in[j-1] + 0.75 in[j] and
    out_fine[2j+1] = 0.75 in[j] + 0.25 in[j+1] (edge-clamped) — exactly
    ``ops/resize.py::upsample_linear`` composed with ``pack``, but as a
    handful of shifted adds on the coarse grid instead of fine-grid
    interpolation + repacking. Unpacked dims interleave spatially.
    """
    nsp = x.ndim - 2
    dims = _pdims(nsp, dims)
    t = x
    npar = 0  # parity axes appended so far (all after the spatial axes)
    for d in range(nsp):
        ax = 1 + d
        pad = [(0, 0)] * t.ndim
        pad[ax] = (1, 1)
        tp = jnp.pad(t, pad, mode="edge")
        g = t.shape[ax]

        def sl(a, b):
            return tuple(
                slice(a, b) if i == ax else slice(None) for i in range(t.ndim)
            )

        lo = tp[sl(0, g)]
        hi = tp[sl(2, g + 2)]
        even = 0.25 * lo + 0.75 * t
        odd = 0.75 * t + 0.25 * hi
        if d in dims:
            # parity axes accumulate BEFORE the channel axis (parity-major)
            t = jnp.stack([even, odd], axis=1 + nsp + npar)
            npar += 1
        else:
            # fine spatial interleave: (..., g, 2, ...) -> (..., 2g, ...)
            t = jnp.stack([even, odd], axis=ax + 1)
            t = t.reshape(t.shape[:ax] + (2 * g,) + t.shape[ax + 2:])
    return t.reshape(t.shape[: 1 + nsp] + (-1,))


def concat_packed(tensors, dims=None) -> Array:
    """Channel concat in packed space: per-parity interleave of the
    constituent channel blocks."""
    nsp = tensors[0].ndim - 2
    f = 2 ** len(_pdims(nsp, dims))
    parts = [t.reshape(t.shape[:-1] + (f, t.shape[-1] // f)) for t in tensors]
    out = jnp.concatenate(parts, axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))
