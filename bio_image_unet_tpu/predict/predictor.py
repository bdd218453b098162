"""The Predict family — batched tiled inference on TPU.

All predictors share one engine: host-side percentile normalization →
patch grid → fixed-shape batched jitted forward (bf16-optional) → vectorized
stitch → TIFF save.  The per-patch batch-1 host↔device round-trip that
dominates the reference's inference cost (unet/predict.py:184-202) is
replaced by device batches; patch counts are padded to the batch size so jit
compiles once per (patch shape, batch size) signature.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import checkpoint
from ..data import tiff
from ..models import get_model
from ..progress import ProgressNotifier
from ..utils.utils import save_as_tif
from .fastpath import build_fast_apply
from .tiling import grid_starts, overlap_starts


def _int_percentile(img: np.ndarray, q: float) -> float:
    """Exact percentile of an integer array via bincount — numpy's 'linear'
    rule without the O(n log n) sort (~40× faster for 1 MP uint8/16 frames;
    host normalization otherwise rivals the device forward per frame)."""
    flat = img.reshape(-1)
    lo = int(flat.min())
    # widen BEFORE subtracting: int8/int16 data spanning more than the
    # dtype's positive range would wrap (e.g. int16 -30000..32000) and
    # crash bincount with negative values
    counts = np.bincount(flat.astype(np.int64) - lo)
    cum = np.cumsum(counts)
    pos = (flat.size - 1) * (q / 100.0)
    lo_k, hi_k = int(np.floor(pos)), int(np.ceil(pos))
    v_lo = int(np.searchsorted(cum, lo_k + 1))
    if hi_k == lo_k:
        return float(lo + v_lo)
    v_hi = int(np.searchsorted(cum, hi_k + 1))
    return float(lo + v_lo + (pos - lo_k) * (v_hi - v_lo))


def _percentile(img: np.ndarray, q: float) -> float:
    if img.dtype in (np.uint8, np.uint16, np.int8, np.int16):
        return _int_percentile(img, q)
    return float(np.nanpercentile(img, q))


def _normalize_stack(imgs: np.ndarray, mode: str, clip_threshold, invert: bool = False,
                     scale: float = 255.0) -> np.ndarray:
    """Percentile clip + min-max normalize a (N, ...) stack
    (reference unet/predict.py:122-150): 'single' per frame, 'first' from the
    first frame's histogram, 'all' from the whole stack."""
    raw = imgs
    imgs = imgs.astype(np.float32)
    if mode == "single":
        out = np.empty_like(imgs)
        for i, img in enumerate(imgs):
            img = np.clip(img, _percentile(raw[i], clip_threshold[0]),
                          _percentile(raw[i], clip_threshold[1]))
            img = img - np.min(img)
            peak = np.max(img)
            if peak > 0:
                img = img / peak * scale
            out[i] = scale - img if invert else img
        return out
    if mode in ("first", "all"):
        ref = raw[0] if mode == "first" else raw
        lo = _percentile(ref, clip_threshold[0])
        hi = _percentile(ref, clip_threshold[1])
        imgs = np.clip(imgs, lo, hi)
        imgs = imgs - np.min(imgs)
        peak = np.max(imgs)
        if peak > 0:
            imgs = imgs / peak * scale
        return scale - imgs if invert else imgs
    raise ValueError(f"normalization_mode {mode} not valid!")


def _tile_plan(h: int, w: int, th: int, tw: int, xs, ys):
    """Static tiling plan for the fused programs: ``exact`` grids (linspace
    starts degenerate to stride-th/tw tiling — the common case when the frame
    is a multiple of the tile) tile AND stitch as pure reshape/transposes; the
    general case uses two axis gathers (rows then columns) — never per-patch
    unrolling, so program size stays O(1) in grid size."""
    nx, ny = len(xs), len(ys)
    exact = (tuple(xs) == tuple(range(0, max(h, th), th))
             and tuple(ys) == tuple(range(0, max(w, tw), tw))
             and max(h, th) == nx * th and max(w, tw) == ny * tw)
    row_idx = (np.asarray(xs)[:, None] + np.arange(th)[None, :]).ravel()
    col_idx = (np.asarray(ys)[:, None] + np.arange(tw)[None, :]).ravel()
    return exact, row_idx, col_idx


def _extract_tiles(frames, nx: int, ny: int, th: int, tw: int,
                   exact: bool, row_idx, col_idx):
    """(F, H', W') padded frames → (F·nx·ny, th, tw, 1) frame-major tiles."""
    f = frames.shape[0]
    if exact:
        return (frames.reshape(f, nx, th, ny, tw)
                .transpose(0, 1, 3, 2, 4)
                .reshape(f * nx * ny, th, tw, 1))
    rows = jnp.take(frames, jnp.asarray(row_idx), axis=1)
    tiles = jnp.take(rows, jnp.asarray(col_idx), axis=2)
    return (tiles.reshape(f, nx, th, ny, tw)
            .transpose(0, 1, 3, 2, 4)
            .reshape(f * nx * ny, th, tw, 1))


def _stitch_chunk_u8(probs, n_frames: int, xs, ys, th: int, tw: int,
                     h: int, w: int, out_h: int, out_w: int, exact: bool):
    """(F·per, th, tw, 1) uint8 tile probabilities → (F, h, w, 1) stitched
    frames: inverse transpose for exact grids (no accumulation), mean-overlap
    scatter-accumulate otherwise."""
    from ..ops.stitch import _stitch_xla

    nx, ny = len(xs), len(ys)
    if exact:
        return (probs.reshape(n_frames, nx, ny, th, tw)
                .transpose(0, 1, 3, 2, 4)
                .reshape(n_frames, nx * th, ny * tw, 1))[:, :h, :w]

    gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
    x_starts = jnp.asarray(gx.ravel().astype(np.int32))
    y_starts = jnp.asarray(gy.ravel().astype(np.int32))

    def stitch_one(frame_patches):
        out, cnt = _stitch_xla(frame_patches.astype(jnp.float32),
                               x_starts, y_starts, out_h, out_w)
        return (out / jnp.maximum(cnt, 1.0)).astype(jnp.uint8)

    framed = probs.reshape((n_frames, nx * ny, th, tw, 1))
    return jax.vmap(stitch_one)(framed)[:, :h, :w]


def _tile_plan_3d(d: int, h: int, w: int, tz: int, tx: int, ty: int,
                  zs, xs, ys):
    """3-axis analog of :func:`_tile_plan` (grid order z-major, then x, y —
    matching the host extraction loops and the stitch start products)."""
    exact = (tuple(zs) == tuple(range(0, max(d, tz), tz))
             and tuple(xs) == tuple(range(0, max(h, tx), tx))
             and tuple(ys) == tuple(range(0, max(w, ty), ty))
             and max(d, tz) == len(zs) * tz and max(h, tx) == len(xs) * tx
             and max(w, ty) == len(ys) * ty)
    idx_z = (np.asarray(zs)[:, None] + np.arange(tz)[None, :]).ravel()
    idx_x = (np.asarray(xs)[:, None] + np.arange(tx)[None, :]).ravel()
    idx_y = (np.asarray(ys)[:, None] + np.arange(ty)[None, :]).ravel()
    return exact, idx_z, idx_x, idx_y


def _extract_tiles_3d(vols, nz: int, nx: int, ny: int, tz: int, tx: int,
                      ty: int, exact: bool, idx_z, idx_x, idx_y):
    """(V, Z', X', Y') padded volumes → (V·nz·nx·ny, tz, tx, ty, 1) tiles in
    volume-major z/x/y grid order."""
    v = vols.shape[0]
    if exact:
        t = vols.reshape(v, nz, tz, nx, tx, ny, ty)
    else:
        g = jnp.take(vols, jnp.asarray(idx_z), axis=1)
        g = jnp.take(g, jnp.asarray(idx_x), axis=2)
        g = jnp.take(g, jnp.asarray(idx_y), axis=3)
        t = g.reshape(v, nz, tz, nx, tx, ny, ty)
    return (t.transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(v * nz * nx * ny, tz, tx, ty, 1))


def _src_nbits(dtype) -> int:
    """Bit width for the device percentile search of a fused program's
    source dtype; 0 selects the float32 sortable-bits search
    (ops/histogram.float_clip_bounds)."""
    if dtype == np.uint8:
        return 8
    if dtype == np.uint16:
        return 16
    if np.issubdtype(np.dtype(dtype), np.floating):
        return 0
    raise ValueError(f"fused pipeline has no device percentile for {dtype}")


def _device_frame_bounds(frames, clip_threshold, n_bits: int):
    """Per-frame ``(lo, hi, fmin, fmax)`` as flat (N,) float32 vectors on
    device, via bitwise binary search over the value space for ANY integer
    width, or (``n_bits=0``) over the order-isomorphic IEEE-754 bit image
    for NaN-free float32 frames.  The search beats the 256-bin one-hot
    histogram even at 8 bits — measured 40.5 vs 54.4 ms per 64 MP on v5e
    (8 passes × 4 stats + min/max ≈ 34 compares/px vs 256), bit-identical
    results on integer inputs.  Callers broadcast to their spatial rank."""
    from ..ops.histogram import float_clip_bounds, int_clip_bounds

    if n_bits == 0:
        return float_clip_bounds(frames, clip_threshold[0], clip_threshold[1])
    return int_clip_bounds(frames, clip_threshold[0], clip_threshold[1],
                           n_bits=n_bits)


def _normalize_clip(frames_f32, lo, hi, fmin, fmax, invert: bool,
                    scale: float = 255.0):
    """Percentile clip + min-max → [0, scale] (the jnp mirror of
    ``_normalize_stack``'s per-frame math; bounds broadcast per frame or are
    stack-global scalars)."""
    f = jnp.clip(frames_f32, lo, hi)
    f = jnp.where(fmax > fmin, (f - fmin) / (fmax - fmin) * scale, 0.0)
    return scale - f if invert else f


def _map_batches(step, xs):
    """``lax.map`` with a single-step escape: when the whole input fits one
    batch, call ``step`` directly — a 1-iteration scan wastes a loop AND
    trips an XLA:CPU LLVM-translation RET_CHECK (observed jax 0.8:
    ``fusion_compiler.cc:490 llvm_module != nullptr`` when a one-step scanned
    conv feeds a vmapped scatter-stitch in the same program)."""
    leading = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if leading == 1:
        one = step(jax.tree_util.tree_map(lambda x: x[0], xs))
        return jax.tree_util.tree_map(lambda x: x[None], one)
    return jax.lax.map(step, xs)


def _shard_batches(t, mesh):
    """Shard a (steps, bs, *tile, C) batch stack's ``bs`` axis over the
    mesh's ``data`` axis: the lax.map forward — measured >=99% of fused
    3D/multi-head program time (benchmarks/NOTES.md round 3) — partitions
    across chips, and XLA inserts one all-gather of the (small) per-tile
    probabilities before the replicated stitch."""
    if mesh is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*((None, "data") + (None,) * (t.ndim - 2)))
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))


def _mesh_key(mesh):
    """Compiled programs bake their mesh: key the cache on its devices AND
    axis topology (the same 8 devices as 8x1 'data' vs 4x2 'data'x'spatial'
    compile to different shardings — devices alone would collide)."""
    if mesh is None:
        return ()
    return ("mesh",) + tuple(
        (name, int(size)) for name, size in mesh.shape.items()
    ) + tuple(str(d) for d in mesh.devices.flat)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _single_tick(progress_notifier, show_progress):
    """One-step iterable for the single-dispatch fused paths: fires a
    caller-supplied notifier start→complete so notifier-driven UIs don't
    appear hung (granularity is one program — there is nothing finer to
    report)."""
    progress = progress_notifier if (show_progress and progress_notifier) else None
    return progress.iterator([0], total=1) if progress else [0]


def _replicate_if_mesh(x, mesh):
    """Replicate a fused-program input over the mesh before dispatch (the
    compiled program's collectives expect mesh-addressable operands)."""
    if mesh is None:
        return jnp.asarray(x)
    from ..parallel import replicated

    return jax.device_put(np.asarray(x), replicated(mesh))


def _is_oom_error(exc: Exception) -> bool:
    """True when an exception is a device out-of-memory, either at compile
    time (this runtime's AOT helper raises INTERNAL with XLA's 'Ran out of
    memory in memory space hbm' report) or at execution (PJRT raises
    RESOURCE_EXHAUSTED)."""
    msg = str(exc).lower()
    return ("resource_exhausted" in msg or "ran out of memory" in msg
            or "out of memory" in msg)


def _resolve_device_pipeline(device_pipeline, blocker) -> bool:
    """The device_pipeline contract shared by every Predict class:
    ``None`` (default) auto-enables the fused program when nothing blocks
    it, ``True`` insists — warning with the reason when it cannot be
    honored (a silent ~25× slower fallback would be a lie) — and ``False``
    forces the host-staged path."""
    if device_pipeline and blocker is not None:
        import warnings

        warnings.warn(
            f"device_pipeline=True cannot be honored: {blocker}; "
            "falling back to the host-staged path", stacklevel=3)
    return (device_pipeline is not False) and blocker is None


def _maybe_enable_compile_cache():
    """Persistent XLA compile cache on TPU backends by default (opt out:
    BIU_TPU_NO_CACHE=1): a cold U-Net compile costs minutes on
    remote/tunneled TPUs and the cache makes it a one-time cost per machine.
    NOT enabled for CPU backends — XLA:CPU AOT cache entries record the build
    host's CPU features and reloading them on a different microarchitecture
    risks SIGILL (observed on this fleet's heterogeneous hosts)."""
    if os.environ.get("BIU_TPU_NO_CACHE"):
        return
    try:
        if jax.default_backend() != "tpu":
            return
        from ..utils.utils import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass


class _Engine:
    """Shared model loading + single-dispatch batched forward.

    The whole patch set moves to the device once (uint8 when the caller's
    data is uint8 — 4× less PCIe/tunnel traffic than float32), a jitted
    ``lax.map`` loops over fixed-size batches *on device* (bounding
    activation memory), and results come back in one transfer, quantized
    on-device (uint8 for the single-head family ≙ unet/predict.py:200,
    float16 for multi-output ≙ multi_output_unet/predict.py:193).  This
    replaces the reference's per-patch batch-1 host↔device round-trip
    (unet/predict.py:184-202) — the dominant cost of its inference path.
    """

    # Compiled runners are cached at MODULE level, keyed by the model's full
    # config — repeated Predict(...) calls in one process (e.g. per-epoch test
    # prediction, unet/train.py:190-197) must NOT recompile: an un-cached
    # recompile costs minutes on a tunneled TPU vs <1s of actual compute.
    _RUNNER_CACHE: dict = {}

    def __init__(self, model_params, network=None, batch_size: int = 8,
                 half_precision: bool = False, mesh=None,
                 quantized: bool = False):
        import json

        _maybe_enable_compile_cache()
        state = checkpoint.load(model_params)
        hp = dict(state["hyperparams"])
        self.hyperparams = hp
        name = network or hp.get("model_name") or hp.get("network")
        if name is None:
            raise ValueError("network is not defined")
        if name == "Unet_v0":
            hp.setdefault("in_channels", 1)
            hp.setdefault("out_channels", 1)
        if name in ("Unet_v0", "BabyUnet"):
            # the legacy models have no bf16 mode (parity first): keep the
            # whole path f32 so fold and flax fallback agree under the same
            # user flags
            half_precision = False
        self.dtype = jnp.bfloat16 if half_precision else jnp.float32
        # bf16 threads through the model blocks (params/BN/logits stay fp32)
        self.model = get_model(name, **{**hp, "dtype": jnp.bfloat16 if half_precision else None})
        self.variables = state["variables"]
        self.batch_size = batch_size
        # eval-mode fast path for the 2D U-Net family: BatchNorms folded into
        # the convs, raw-lax forward (predict/fastpath.py) — ~10× faster than
        # the layered flax graph on the target chip, same math
        raw_variables = self.variables
        fast = build_fast_apply(self.model, self.variables,
                                jnp.bfloat16 if half_precision else None)
        if fast is not None:
            self._apply_fn, self.variables = fast
        else:
            self._apply_fn = lambda variables, *args: self.model.apply(
                variables, *args, train=False)
        # opt-in w8a8 int8 inference (predict/quant.py): 1.54× the bf16 fast
        # path on the target chip (benchmarks/probe_quant.py); activation
        # scales are calibrated lazily from the first fused chunk
        self._quant = None
        self._quant_ready = False
        if quantized:
            from .quant import int8_builders, int8_status

            status = int8_status(self.model) if fast is not None else None
            if status == "enabled":
                self._quant = int8_builders(self.model, raw_variables)
            else:
                import warnings

                if status == "experimental":
                    from .quant import _INT8_MEASURED_RATIO, _int8_family

                    ratio = _INT8_MEASURED_RATIO[_int8_family(self.model)]
                    verdict = (f"measured SLOWER than bf16 ({ratio:.2f}x)"
                               if ratio < 1.0 else
                               f"measured only {ratio:.2f}x over bf16, "
                               "below the ~1.15x ship bar")
                    warnings.warn(
                        "quantized=True for this family has a full int8 "
                        f"implementation but its end-to-end pipeline "
                        f"{verdict} on the target chip (benchmarks/"
                        "PROBE_NESTED_INT8.json, "
                        "PROBE_3D_VARIANTS_INT8.json); set "
                        "BIU_INT8_EXPERIMENTAL=1 to run "
                        "int8 anyway — running the bf16 path instead",
                        stacklevel=3)
                else:
                    name = type(self.model).__name__
                    reason = (
                        "the 'corr' join has no int8 formulation (the "
                        "correlation's kernel is a traced activation, not "
                        "a weight)"
                        if getattr(self.model, "mode", None) == "corr"
                        else f"{name} has no int8 formulation")
                    warnings.warn(
                        f"quantized=True declined: {reason}. int8 covers "
                        "Unet (incl. dilation), AttentionUnet, Siam_UNet "
                        "max/control/concat joins, MultiOutputUnet, and — "
                        "measurement-gated — UNet++ and the 3D trunks; "
                        "running the bf16 path instead", stacklevel=3)
        # volatile training-progress fields must NOT enter the program cache
        # key: scheduler_state changes nearly every epoch, and a per-epoch
        # cache miss means minutes of recompilation per test prediction on a
        # tunneled TPU — exactly what _RUNNER_CACHE exists to prevent
        _volatile = ("scheduler_state",)
        self._cache_key = (
            type(self.model).__name__,
            json.dumps({k: repr(v) for k, v in hp.items()
                        if k not in _volatile}, sort_keys=True),
            str(self.dtype),
            fast is not None,
        ) + (("int8",) if self._quant is not None else ())
        # multi-chip data parallelism: each lax.map step's batch axis is
        # sharded over the mesh's `data` axis (SURVEY.md §2.8 — the predict
        # path is embarrassingly parallel over patches); XLA partitions the
        # convs and the per-device batch slices ride ICI-free
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the mesh "
                    f"data axis ({mesh.shape['data']})"
                )
            self._batch_sharding = NamedSharding(mesh, P(None, "data"))
            from ..parallel import replicated

            self.variables = jax.device_put(self.variables, replicated(mesh))

    @staticmethod
    def _forward_with(apply_fn, dtype, x, prev, quantize: bool, variables):
        """Free function so cached jitted closures capture only
        (apply_fn, dtype) — NOT the engine instance: class-level program
        caches must not pin an engine's device-resident weights alive."""
        scale = 1.0 / 255.0 if x.dtype == jnp.uint8 else 1.0
        xf = x.astype(dtype) * scale
        args = (xf,) if prev is None else (xf, prev.astype(dtype) * scale)
        out = apply_fn(variables, *args)
        if isinstance(out, dict):
            return {k: v.astype(jnp.float16) for k, v in out.items()}
        probs = out[0]
        if quantize:
            return (probs.astype(jnp.float32) * 255.0).astype(jnp.uint8)
        return probs.astype(jnp.float32)

    def _forward(self, x, prev, quantize: bool, variables):
        return self._forward_with(self._apply_fn, self.dtype, x, prev,
                                  quantize, variables)

    # int8 calibration: tiles sampled from this many frames, evenly spaced
    # across the whole stack (the streaming siam path pre-decodes the same
    # evenly-spaced pairs before its first chunk)
    _QUANT_CAL_FRAMES = 2
    _QUANT_CAL_TILES = 32
    # headroom on calibrated max|activation|: later frames may swing
    # slightly past the sample's range; saturating costs accuracy while the
    # ~0.14 bit of resolution this margin spends does not (measured — the
    # parity test bounds hold with and without it)
    _QUANT_CAL_MARGIN = 1.1

    def _calibrate_int8(self, imgs_u8, xs, ys, resize_dim, clip_threshold,
                        invert, prev_u8=None, fixed_bounds=None,
                        pair_mode="single"):
        """Calibrate the w8a8 forward on tiles of the actual movie: one
        instrumented bf16 dispatch records per-site max|activation|
        (predict/quant.py), then the engine swaps in the int8 apply + packed
        int8 weights.  Runs once per Predict; the compiled fused program
        takes the scales as traced arguments, so it is reused across movies.
        ``prev_u8`` supplies the previous-frame stream for siamese models.
        ``fixed_bounds`` — (lo, hi, gmin, gmax) — makes the calibration tiles
        use the SAME stack-global normalization the inference program will
        apply ('first'/'all' modes); without it a frame whose own range
        differs from the stack bounds would calibrate scales the real
        activations then exceed (advisor finding, round 3).  ``pair_mode``
        is the siamese analog: the fused pair program normalizes BOTH planes
        of pair i from the prev plane's bounds ('first') or the 2-plane
        stack's ('all') — calibrating such pairs per-plane would record
        maxes from a different input distribution than inference sees (e.g.
        a bright cur clipped into a dark prev's range reaches the net as a
        near-constant saturated plane, not a texture-stretched one)."""
        cal_fn = self._quant[0]
        th, tw = resize_dim
        # evenly-spaced frames, not the leading ones: a movie whose opening
        # frames are dark/empty would otherwise calibrate tiny scales and
        # saturate on the content that appears later
        n_avail = len(imgs_u8)
        frame_idx = np.unique(np.linspace(
            0, n_avail - 1, self._QUANT_CAL_FRAMES).round().astype(int))

        def tiles_from(norm):
            """[0,1] normalized (F, h, w) planes → strided calibration
            tiles (the sampling shared by every normalization branch)."""
            h, w = norm.shape[1:3]
            if th > h or tw > w:
                norm = np.pad(norm, ((0, 0), (0, max(0, th - h)),
                                     (0, max(0, tw - w))), mode="reflect")
            tiles = [norm[i, x: x + th, y: y + tw]
                     for i in range(norm.shape[0]) for x in xs for y in ys]
            # stride across the whole field: taking the FIRST N tiles of a
            # large frame would calibrate only its top rows and clip bright
            # content elsewhere (review finding); ceil step so the sample
            # always spans to the last tile even when N <= len < 2N
            step = -(-len(tiles) // self._QUANT_CAL_TILES)
            return jnp.asarray(
                np.stack(tiles[::step][: self._QUANT_CAL_TILES])[..., None],
                jnp.float32)

        def sample_tiles(frames):
            if fixed_bounds is not None:
                # mirror _normalize_clip with the caller's global bounds
                lo, hi, gmin, gmax = (float(v) for v in fixed_bounds)
                f = np.clip(np.asarray(frames)[frame_idx].astype(np.float32),
                            lo, hi)
                f = ((f - gmin) / (gmax - gmin) * 255.0
                     if gmax > gmin else np.zeros_like(f))
                norm = (255.0 - f if invert else f) / 255.0
            else:
                norm = _normalize_stack(
                    np.asarray(frames)[frame_idx], "single",
                    clip_threshold, invert) / 255.0
            return tiles_from(norm)

        if prev_u8 is not None and pair_mode in ("first", "all"):
            # host mirror of fused_predict_pairs' per-pair bounds: lo/hi are
            # the percentiles of the prev plane ('first') or the 2-plane
            # stack ('all'); fmin/fmax are that reference's extremes clamped
            # into [lo, hi] (ops/histogram.int_clip_bounds semantics)
            prevs = np.asarray(prev_u8)[frame_idx]
            curs = np.asarray(imgs_u8)[frame_idx]
            norm_p = np.empty(prevs.shape, np.float32)
            norm_c = np.empty(curs.shape, np.float32)
            for i in range(len(frame_idx)):
                ref = (prevs[i] if pair_mode == "first"
                       else np.stack([prevs[i], curs[i]]))
                lo = _percentile(ref, clip_threshold[0])
                hi = _percentile(ref, clip_threshold[1])
                fmin = max(float(ref.min()), lo)
                fmax = min(float(ref.max()), hi)
                for src, dst in ((prevs, norm_p), (curs, norm_c)):
                    f = np.clip(src[i].astype(np.float32), lo, hi)
                    f = ((f - fmin) / (fmax - fmin) * 255.0
                         if fmax > fmin else np.zeros_like(f))
                    dst[i] = (255.0 - f if invert else f) / 255.0
            self._finish_int8_calibration(
                cal_fn(tiles_from(norm_c), tiles_from(norm_p)))
            return

        x = sample_tiles(imgs_u8)
        args = (x,) if prev_u8 is None else (x, sample_tiles(prev_u8))
        self._finish_int8_calibration(cal_fn(*args))

    def _finish_int8_calibration(self, raw_maxes):
        """Shared tail of the 2D and 3D calibration passes: headroom margin,
        int8 weight baking, mesh replication, apply-fn swap."""
        _, quant_apply, make_vars = self._quant
        variables = make_vars(np.asarray(raw_maxes) * self._QUANT_CAL_MARGIN)
        if self.mesh is not None:
            from ..parallel import replicated

            variables = jax.device_put(variables, replicated(self.mesh))
        self.variables = variables
        self._apply_fn = quant_apply
        self._quant_ready = True

    # int8 calibration sub-volumes for the 3D family: 3D tiles are ~100×
    # the pixel count of 2D tiles, so far fewer suffice for per-tensor maxes
    _QUANT_CAL_TILES_3D = 8

    def _calibrate_int8_3d(self, vols, zs, xs, ys, tile, clip_threshold,
                           invert=False, fixed_bounds=None):
        """3D analog of :meth:`_calibrate_int8`: sub-volumes sampled across
        the tiling grid of (up to two) volumes spanning the stack, normalized
        the way the fused 3D programs do (per-volume bounds for 'single';
        with ``fixed_bounds`` the caller's stack-global 'first'/'all' bounds,
        so the calibration sees the SAME input distribution inference will —
        the round-3 advisor finding the 2D path already fixes), one
        instrumented bf16 dispatch (predict/quant3d.py), then the int8 apply
        + packed weights swap in."""
        cal_fn = self._quant[0]
        tz, tx, ty = tile
        vols = np.asarray(vols)
        if vols.ndim == 3:
            vols = vols[None]
        vidx = np.unique(np.linspace(0, len(vols) - 1, 2).round().astype(int))
        if fixed_bounds is not None:
            # mirror _normalize_clip with the caller's global bounds
            lo, hi, gmin, gmax = (float(v) for v in fixed_bounds)
            f = np.clip(vols[vidx].astype(np.float32), lo, hi)
            f = ((f - gmin) / (gmax - gmin)
                 if gmax > gmin else np.zeros_like(f))
            norm = (1.0 - f) if invert else f
        else:
            norm = _normalize_stack(
                vols[vidx].reshape(len(vidx), -1), "single", clip_threshold,
                invert).reshape((len(vidx),) + vols.shape[1:]) / 255.0
        pads = [(0, max(0, t - s)) for t, s in zip(tile, norm.shape[1:])]
        if any(p[1] for p in pads):
            norm = np.pad(norm, [(0, 0)] + pads, mode="reflect")
        tiles = [norm[v, z: z + tz, x: x + tx, y: y + ty]
                 for v in range(len(vidx)) for z in zs for x in xs for y in ys]
        # stride across the whole grid (not the leading corner) so bright
        # content anywhere in the volume reaches the calibration sample
        step = -(-len(tiles) // self._QUANT_CAL_TILES_3D)
        batch = jnp.asarray(
            np.stack(tiles[::step][: self._QUANT_CAL_TILES_3D])[..., None],
            jnp.float32)
        self._finish_int8_calibration(cal_fn(batch))

    # batches per compiled super-chunk: every dispatch sees the same static
    # shape (CHUNK_BATCHES, bs, *tile, C), so a movie of ANY length reuses
    # the same two compiled programs (full chunk + padded tail chunk)
    CHUNK_BATCHES = 8

    # bound: each retained entry keeps a compiled executable (and its
    # apply_fn recipe) alive; evict oldest-first past the cap so a
    # long-running process predicting many distinct configs cannot grow
    # host/HBM footprint without limit
    CACHE_CAP = 32

    @classmethod
    def _cache_put(cls, cache: dict, key, value):
        cache[key] = value
        while len(cache) > cls.CACHE_CAP:
            cache.pop(next(iter(cache)))  # dicts preserve insertion order

    @classmethod
    def _cache_get(cls, cache: dict, key):
        """LRU hit: re-insert at the back.  Plain FIFO would evict the
        HOTTEST program when a long-lived process alternates CAP+1 configs
        (the steadily-reused key stays at the front and is the first out)."""
        value = cache.pop(key)
        cache[key] = value
        return value

    def _get_runner(self, with_prev: bool, quantize: bool):
        key = self._cache_key + (with_prev, quantize)
        if key not in _Engine._RUNNER_CACHE:
            forward, apply_fn, dtype = self._forward_with, self._apply_fn, self.dtype

            def run_all(variables, batches, prev_batches=None):
                if with_prev:
                    return _map_batches(
                        lambda ab: forward(apply_fn, dtype, ab[0], ab[1],
                                           quantize, variables),
                        (batches, prev_batches),
                    )
                return _map_batches(
                    lambda b: forward(apply_fn, dtype, b, None, quantize,
                                      variables), batches
                )

            self._cache_put(_Engine._RUNNER_CACHE, key, jax.jit(run_all))
        return self._cache_get(_Engine._RUNNER_CACHE, key)

    _FUSED_CACHE: dict = {}

    # frames per fused dispatch: the compiled program's shape is
    # (FUSED_CHUNK_FRAMES, h, w) regardless of movie length — a 10,000-frame
    # movie reuses the SAME compiled program chunk after chunk (the last chunk
    # is padded by repeating its final frame).  Large enough that each
    # dispatch amortizes the ~40 ms tunneled-TPU round-trip over many batches.
    FUSED_CHUNK_FRAMES = 16
    # chunks per host→device upload (bigger transfers amortize the link's
    # fixed per-transfer latency; per-chunk slicing happens on device)
    SUPER_CHUNKS = 4
    # max un-fetched chunk outputs kept on device: bounds HBM use at
    # O(window · chunk) for arbitrarily long movies (64 × 16 frames of
    # 1024² uint8 ≈ 1 GB) while staying deep enough that fetches of the
    # oldest chunk overlap compute of the newest
    FUSED_PENDING_CHUNKS = 64

    def _fused_frames_fn(self, n_frames: int, h: int, w: int, src_dtype,
                         xs: tuple, ys: tuple, resize_dim, clip_threshold,
                         invert: bool, fixed: bool):
        """Build (or fetch) the compiled fused 2D chunk program for this
        shape/dtype/engine config and return ``(fn, n_chunk)``.  ``fn`` maps
        ``(variables, (n_chunk, h, w) raw frames[, bounds])`` to stitched
        uint8 masks entirely on device; ``n_chunk`` is the program's fixed
        frame count.  Split out of :meth:`fused_predict_frames` so benches
        can reach the exact dispatched program through a supported accessor
        (:meth:`fused_runner`) instead of poking ``_FUSED_CACHE``."""
        th, tw = resize_dim
        out_h, out_w = max(th, h), max(tw, w)
        mesh = self.mesh
        n_chunk = min(self.FUSED_CHUNK_FRAMES, n_frames)
        if mesh is not None:
            ndata = mesh.shape["data"]
            n_chunk = _round_up(n_chunk, ndata)
            k_loc = n_chunk // ndata  # frames per chip
        else:
            k_loc = n_chunk
        # the fused path sizes its own forward batch: one lax.map step per
        # ~16M tile pixels (≈1 GB of level-1 activations in bf16) — measured
        # 2.2× faster than small batches on v5e (MXU fill), still far under
        # HBM.  The user's batch_size remains the floor for tiny workloads.
        per_chunk = len(xs) * len(ys) * k_loc
        bs = max(self.batch_size, min(per_chunk, (1 << 24) // (th * tw)))
        key = self._cache_key + ("fused", n_chunk, h, w, th, tw, xs, ys,
                                 tuple(clip_threshold), invert, bs,
                                 str(src_dtype), fixed) + _mesh_key(mesh)
        if key not in _Engine._FUSED_CACHE:
            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nx, ny = len(xs), len(ys)
            per = nx * ny
            n = k_loc * per
            n_pad = _round_up(n, bs)
            exact, row_idx, col_idx = _tile_plan(h, w, th, tw, xs, ys)
            n_bits = _src_nbits(src_dtype)

            def pipeline(variables, movie_u8, bounds=None):
                if bounds is not None:
                    # 'first'/'all': one stack-global (lo, hi, min, max) —
                    # traced scalars, so the program is reused across movies
                    lo, hi, fmin, fmax = (bounds[i] for i in range(4))
                else:
                    # per-frame percentile clip + min-max → [0, 255]; exact
                    # histogram/bit-search percentiles — jnp.percentile would
                    # SORT 1M pixels per frame, competing with the U-Net for
                    # device time
                    lo, hi, fmin, fmax = (
                        v[:, None, None] for v in _device_frame_bounds(
                            movie_u8, clip_threshold, n_bits))
                f = _normalize_clip(movie_u8.astype(jnp.float32),
                                    lo, hi, fmin, fmax, invert)
                if th > h:
                    f = jnp.pad(f, ((0, 0), (0, th - h), (0, 0)), mode="reflect")
                if tw > w:
                    f = jnp.pad(f, ((0, 0), (0, 0), (0, tw - w)), mode="reflect")
                u8 = f.astype(jnp.uint8)  # reference patch quantization
                patches = _extract_tiles(u8, nx, ny, th, tw, exact,
                                         row_idx, col_idx)
                if n_pad != n:
                    patches = jnp.concatenate(
                        [patches, jnp.broadcast_to(patches[-1:],
                                                   (n_pad - n,) + patches.shape[1:])])
                batches = patches.reshape((n_pad // bs, bs, th, tw, 1))
                probs = _map_batches(
                    lambda b: forward(apply_fn, dt, b, None, True, variables),
                    batches
                ).reshape((-1, th, tw, 1))[:n]
                return _stitch_chunk_u8(probs, k_loc, xs, ys, th, tw,
                                        h, w, out_h, out_w, exact)

            if mesh is None:
                compiled = jax.jit(pipeline)
            else:
                # frames shard over `data`; every chip runs the same local
                # program on k_loc frames — no collectives anywhere
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                specs = (P(), P("data")) + ((P(),) if fixed else ())
                # int8 only: the stitch scan's replicated zero-init trips
                # the varying-axes fixpoint under the int8 forward, so that
                # program disables the static check like the halo/trainer
                # shard_maps (correctness asserted empirically — mesh must
                # equal single-chip exactly, test_predict_mesh/test_quant);
                # the bf16 program keeps the trace-time check
                compiled = jax.jit(shard_map(pipeline, mesh=mesh,
                                             in_specs=specs,
                                             out_specs=P("data"),
                                             check_vma=self._quant is None))
            self._cache_put(_Engine._FUSED_CACHE, key, compiled)
        return self._cache_get(_Engine._FUSED_CACHE, key), n_chunk

    def fused_runner(self, sample_frames: np.ndarray, xs, ys, resize_dim,
                     clip_threshold, invert: bool = False,
                     fixed_bounds: Optional[np.ndarray] = None):
        """Supported device-resident bench accessor: prepare the engine
        exactly as :meth:`fused_predict_frames` would for this workload —
        int8 calibration on ``sample_frames`` when ``quantized=True``, one
        warm dispatch so the program is compiled — and return
        ``(fn, n_chunk)``: the very chunk program the end-to-end path
        dispatches, plus its fixed frame count.  Benches time
        ``fn(engine.variables, hbm_resident_chunk)`` to measure steady-state
        chip throughput with the host link out of the loop (``bench.py``,
        ``benchmarks/int8_bench.py``).  ``sample_frames`` must carry the
        workload's (h, w) and dtype; calibration quality follows its
        content.  With ``fixed_bounds`` set, call the returned program as
        ``fn(variables, chunk, bounds)``."""
        sample = np.asarray(sample_frames)
        if sample.ndim != 3:
            raise ValueError("sample_frames must be (frames, h, w), got "
                             f"shape {sample.shape}")
        if (np.issubdtype(sample.dtype, np.floating)
                and np.isnan(sample).any()):
            # same gate as the Predict entry points: the device percentile
            # search sorts NaNs above +inf and corrupts the upper clip
            # bound; with fixed_bounds the search is skipped but NaNs still
            # poison the normalized tiles (NaN→uint8 cast is undefined) and,
            # under quantized=True, the calibrated activation scales. The
            # e2e path falls back to host nanpercentile; a bench accessor
            # has no host path, so refuse loudly in every configuration.
            raise ValueError(
                "sample_frames contains NaNs — the fused device programs "
                "cannot screen them (Predict falls back to the host "
                "nanpercentile path for such movies); pass NaN-free frames")
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8(sample, xs, ys, resize_dim, clip_threshold,
                                 invert, fixed_bounds=fixed_bounds)
        fn, n_chunk = self._fused_frames_fn(
            len(sample), sample.shape[1], sample.shape[2],
            sample.dtype, xs, ys, resize_dim, clip_threshold, invert,
            fixed_bounds is not None)
        # one warm call (compile + any lazy constant folding) on the sample
        chunk = sample[:n_chunk]
        if len(chunk) < n_chunk:
            chunk = np.concatenate(
                [chunk, np.broadcast_to(chunk[-1:],
                                        (n_chunk - len(chunk),) + chunk.shape[1:])])
        warm = jnp.asarray(chunk)
        if fixed_bounds is not None:
            out = fn(self.variables, warm,
                     jnp.asarray(np.asarray(fixed_bounds, np.float32)))
        else:
            out = fn(self.variables, warm)
        jax.block_until_ready(out)
        return fn, n_chunk

    def fused_predict_frames(self, imgs_u8: np.ndarray, xs, ys, resize_dim,
                             clip_threshold, invert: bool, progress=None,
                             fixed_bounds: Optional[np.ndarray] = None):
        """The speed-of-light 2D predict: raw uint8/uint16 frames are
        uploaded in fixed-size chunks and one jitted program per chunk does
        per-frame percentile normalization, static-grid tiling (two XLA
        row/column gathers — no per-patch unrolling, so program size and
        compile count are O(1) in movie length), the batched U-Net forward
        (lax.map), uint8 quantization and mean-overlap stitching — only the
        stitched uint8 masks return to the host.  All chunks are dispatched
        asynchronously (upload of chunk k+1 overlaps compute of chunk k) and
        fetched once at the end.  Semantics match the host-staged path within
        one uint8 quantization step (normalization in float32 instead of
        numpy float64).

        ``fixed_bounds`` — (lo, hi, gmin, gmax) float32 — switches from
        per-frame ('single') normalization to stack-global bounds: the
        'first'/'all' modes of unet/predict.py:135-148, whose percentiles are
        computed ONCE (host bincount, O(n)) and threaded in as *traced*
        scalars, so every movie reuses one compiled program per shape.

        With an engine ``mesh``, the chunk's FRAMES shard over the mesh's
        ``data`` axis via ``shard_map`` — each chip runs the identical
        single-chip program on its frame shard with ZERO collectives (frames
        are independent end-to-end: normalize, tile, forward, stitch), the
        natural SPMD layout for tiled inference (SURVEY.md §2.8)."""
        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8(imgs_u8, xs, ys, resize_dim, clip_threshold,
                                 invert, fixed_bounds=fixed_bounds)
        n_frames, h, w = imgs_u8.shape
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        fn, n_chunk = self._fused_frames_fn(
            n_frames, h, w, imgs_u8.dtype, xs, ys, resize_dim,
            clip_threshold, invert, fixed_bounds is not None)
        mesh = self.mesh
        bounds_dev = (jnp.asarray(np.asarray(fixed_bounds, np.float32))
                      if fixed_bounds is not None else None)
        chunk_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            chunk_sharding = NamedSharding(mesh, P("data", None, None))

        # Upload in large super-blocks (one device_put per SUPER_CHUNKS
        # chunks) and slice per-chunk ON DEVICE: on remote/tunneled TPUs each
        # transfer pays ~1 s fixed latency, so 4× fewer, 4× bigger uploads
        # are markedly faster; chunk results are still fetched per-chunk
        # (the link's sweet spot) in one batched device_get at the end.
        super_frames = n_chunk * self.SUPER_CHUNKS
        pending = []
        done = []
        # cap device-resident outputs: without a window, a 20k-frame movie
        # would hold every stitched chunk in HBM until the final fetch
        window = max(1, self.FUSED_PENDING_CHUNKS)
        steps = list(range(0, n_frames, super_frames))
        it = progress.iterator(steps) if progress is not None else steps
        for sstart in it:
            sstop = min(sstart + super_frames, n_frames)
            block = imgs_u8[sstart:sstop]
            k = block.shape[0]
            k_pad = _round_up(k, n_chunk)
            if k_pad != k and not isinstance(block, jax.Array):
                block = np.concatenate(
                    [block, np.broadcast_to(block[-1:], (k_pad - k, h, w))])
            elif k_pad != k:
                block = jnp.concatenate(
                    [block, jnp.broadcast_to(block[-1:], (k_pad - k, h, w))])
            dev = jnp.asarray(block)  # no-op for already-resident arrays
            for cstart in range(0, k, n_chunk):
                n_real = min(n_chunk, k - cstart)
                chunk_dev = dev[cstart : cstart + n_chunk]
                if chunk_sharding is not None:
                    chunk_dev = jax.device_put(chunk_dev, chunk_sharding)
                out = (fn(self.variables, chunk_dev)
                       if bounds_dev is None
                       else fn(self.variables, chunk_dev, bounds_dev))
                try:
                    # start the D2H copy as soon as the chunk's compute
                    # finishes — downloads of early chunks then overlap the
                    # uploads/compute of later ones (the link is the
                    # bottleneck on tunneled runtimes and is full-duplex)
                    out.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                pending.append((out, n_real))
                if len(pending) > window:
                    buf, k_old = pending.pop(0)
                    done.append(jax.device_get(buf)[:k_old])
        fetched = jax.device_get([dev for dev, _ in pending])
        done.extend(buf[:k] for buf, (_, k) in zip(fetched, pending))
        return np.concatenate(done)

    def fused_predict_pairs(self, blocks: np.ndarray, xs, ys, resize_dim,
                            clip_threshold, invert: bool, mode: str):
        """Fused Siam chunk: ``blocks`` is (k+1, h, w) raw uint8/uint16 where
        pair i = (prev=blocks[i], current=blocks[i+1]).  One jitted program
        per shape normalizes every pair with the reference's PER-PAIR
        semantics (siam_unet/predict.py:102-123 builds [prev, current] inside
        the frame loop and __preprocess takes its percentiles from that
        2-frame stack: 'single' = per plane, 'first' = the prev plane's
        bounds for both, 'all' = bounds of the pair), tiles both planes, runs
        the twin-input forward and mean-stitches — the per-frame host Python
        normalize/tile loop this replaces, not the chip, bound the round-2
        Siam path.  Returns (k, h, w) uint8 masks."""
        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8(blocks[1:], xs, ys, resize_dim,
                                 clip_threshold, invert, prev_u8=blocks[:-1],
                                 pair_mode=mode)
        k = blocks.shape[0] - 1
        h, w = blocks.shape[1], blocks.shape[2]
        th, tw = resize_dim
        out_h, out_w = max(th, h), max(tw, w)
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        src_dtype = blocks.dtype
        n = k * len(xs) * len(ys)
        # twin encoder ⇒ ~2× the single-plane activations per tile: halve the
        # 2D path's 16M-tile-pixel map step
        mesh = self.mesh
        bs = max(self.batch_size, min(n, (1 << 23) // (th * tw)))
        if mesh is not None:  # shard the map batch over `data`
            bs = _round_up(bs, mesh.shape["data"])
        key = self._cache_key + ("fused_siam", k, h, w, th, tw, xs, ys,
                                 tuple(clip_threshold), invert, mode, bs,
                                 str(src_dtype)) + _mesh_key(mesh)
        if key not in _Engine._FUSED_CACHE:
            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nx, ny = len(xs), len(ys)
            n_pad = _round_up(n, bs)
            exact, row_idx, col_idx = _tile_plan(h, w, th, tw, xs, ys)
            n_bits = _src_nbits(src_dtype)

            def pipeline(variables, blk):
                prevs, curs = blk[:-1], blk[1:]
                def bounds3(frames):
                    return tuple(v[:, None, None] for v in
                                 _device_frame_bounds(frames, clip_threshold,
                                                      n_bits))

                if mode == "single":
                    # one histogram/bit-search pass over the k+1 distinct
                    # frames; interior frames serve as prev of one pair and
                    # cur of the next with identical per-frame bounds
                    b = bounds3(blk)
                    pb = tuple(v[:-1] for v in b)
                    cb = tuple(v[1:] for v in b)
                elif mode == "first":
                    pb = cb = bounds3(prevs)
                else:  # 'all': bounds of each pair's 2-plane stack
                    pairs = jnp.concatenate([prevs.reshape(k, -1),
                                             curs.reshape(k, -1)], axis=1)
                    pb = cb = bounds3(pairs)
                pn = _normalize_clip(prevs.astype(jnp.float32), *pb, invert)
                cn = _normalize_clip(curs.astype(jnp.float32), *cb, invert)
                # constant (zero) padding for small frames
                # (siam_unet/predict.py:168-180 — unlike 2D's reflect)
                pad_cfg = ((0, 0), (0, max(th - h, 0)), (0, max(tw - w, 0)))
                if th > h or tw > w:
                    pn = jnp.pad(pn, pad_cfg)
                    cn = jnp.pad(cn, pad_cfg)
                prev_tiles = _extract_tiles(pn.astype(jnp.uint8), nx, ny, th,
                                            tw, exact, row_idx, col_idx)
                cur_tiles = _extract_tiles(cn.astype(jnp.uint8), nx, ny, th,
                                           tw, exact, row_idx, col_idx)
                if n_pad != n:
                    def pad(t):
                        return jnp.concatenate(
                            [t, jnp.broadcast_to(t[-1:], (n_pad - n,) + t.shape[1:])])
                    prev_tiles, cur_tiles = pad(prev_tiles), pad(cur_tiles)
                bc = _shard_batches(
                    cur_tiles.reshape((n_pad // bs, bs, th, tw, 1)), mesh)
                bp = _shard_batches(
                    prev_tiles.reshape((n_pad // bs, bs, th, tw, 1)), mesh)
                probs = _map_batches(
                    lambda ab: forward(apply_fn, dt, ab[0], ab[1], True,
                                       variables), (bc, bp)
                ).reshape((-1, th, tw, 1))[:n]
                return _stitch_chunk_u8(probs, k, xs, ys, th, tw,
                                        h, w, out_h, out_w, exact)

            self._cache_put(_Engine._FUSED_CACHE, key, jax.jit(pipeline))
        fn = self._cache_get(_Engine._FUSED_CACHE, key)
        return fn(self.variables, _replicate_if_mesh(blocks, mesh))

    # total tile pixels (patches × tile area) a single fused multi-head
    # program may materialize as float32 — beyond this the host-staged path
    # (bounded by predict_patches' chunking) takes over.  The reference's
    # uncovered-pixel fill is the mean over ALL frames' patches
    # (multi_output_unet/predict.py:279), so the fused program must see the
    # whole stack at once: 2^27 px ≈ 0.5 GB of patches, far past any
    # realistic multi-head stack (a 64-frame 1024² movie is 2^26).
    FUSED_HEADS_MAX_PX = 1 << 27

    def fused_predict_heads(self, imgs_raw: np.ndarray, xs, ys, patch_size,
                            clip_threshold, factors,
                            fixed_bounds: Optional[np.ndarray] = None,
                            _bs: Optional[int] = None):
        """Fused multi-head predict (≙ multi_output_unet/predict.py:102-285):
        raw uint8/uint16 frames go up in ONE transfer (2–4× less link traffic
        than the round-2 float32 patch upload) and one program normalizes
        ([0, 1] scale — the multi-head family's contract), reflect-pads,
        tiles, runs the multi-head forward and safe-margin-stitches every
        head (weights rebuilt per patch from the per-axis ``factors`` tables
        — the dense weight stack is never materialized or uploaded).
        Returns {head: (N, out_h, out_w, c) float16 device array} — the
        reference's own result-patch dtype, halving the D2H transfer;
        callers cast to float32.  ``_bs`` is the OOM-backoff override (see
        :func:`_dispatch_with_oom_backoff`)."""
        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8(imgs_raw, xs, ys, patch_size,
                                 clip_threshold, False,
                                 fixed_bounds=fixed_bounds)
        n_frames, h, w = imgs_raw.shape
        ph, pw = patch_size
        out_h, out_w = max(ph, h), max(pw, w)
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        src_dtype = imgs_raw.dtype
        per = len(xs) * len(ys)
        n = n_frames * per
        mesh = self.mesh
        # 16M tile pixels per map step like the plain-2D chunk path (same
        # single trunk; the per-head 1x1 convs are negligible): the MXU only
        # saturates near ~8-16M px/dispatch — the old 4M cap ran 512^2 tiles
        # at bs=16 = 94 MP/s vs 177 at bs=64 (benchmarks/
        # PROBE_HEADS_BREAKDOWN.json batch sweep).  The dense-grid UNet++
        # keeps every x_{i,j} column alive (~4× the plain trunk's live
        # activations: 32×512² of it OOM'd a 16G chip — four 2G
        # bf16[32,512,512,64] temps), so it keeps the proven 4M cap.
        from ..models.nested_unet import MultiOutputNestedUNet

        cap = ((1 << 22) if isinstance(self.model, MultiOutputNestedUNet)
               else (1 << 24))
        bs = _bs if _bs is not None else max(1, min(n, cap // (ph * pw)))
        if mesh is not None:
            bs = _round_up(bs, mesh.shape["data"])
        fixed = fixed_bounds is not None
        # factors are baked into the traced program as constants, so they
        # MUST key the cache: same shapes with a different safe_margin is a
        # different program
        key = self._cache_key + ("fused_heads", n_frames, h, w, ph, pw, xs,
                                 ys, tuple(clip_threshold), bs,
                                 str(src_dtype), fixed,
                                 tuple(np.asarray(f, np.float32).tobytes()
                                       for f in factors)) + _mesh_key(mesh)
        if key not in _Engine._FUSED_CACHE:
            from ..ops.stitch import _stitch_factored_xla

            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nx, ny = len(xs), len(ys)
            n_pad = _round_up(n, bs)
            exact, row_idx, col_idx = _tile_plan(h, w, ph, pw, xs, ys)
            n_bits = _src_nbits(src_dtype)
            gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
            starts = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int32)
            gi, gj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
            grid_idx = np.stack([gi.ravel(), gj.ravel()], axis=1).astype(np.int32)
            facs = tuple(jnp.asarray(f) for f in factors)  # O(n·t) tables

            def pipeline(variables, movie, bounds=None):
                if bounds is not None:
                    lo, hi, fmin, fmax = (bounds[i] for i in range(4))
                else:
                    lo, hi, fmin, fmax = (
                        v[:, None, None] for v in _device_frame_bounds(
                            movie, clip_threshold, n_bits))
                f = _normalize_clip(movie.astype(jnp.float32), lo, hi,
                                    fmin, fmax, invert=False, scale=1.0)
                # normalize BEFORE the reflect pad — padded copies would
                # double-count border pixels in the percentile histograms
                if ph > h:
                    f = jnp.pad(f, ((0, 0), (0, ph - h), (0, 0)), mode="reflect")
                if pw > w:
                    f = jnp.pad(f, ((0, 0), (0, 0), (0, pw - w)), mode="reflect")
                patches = _extract_tiles(f, nx, ny, ph, pw, exact,
                                         row_idx, col_idx)
                if n_pad != n:
                    patches = jnp.concatenate(
                        [patches, jnp.broadcast_to(patches[-1:],
                                                   (n_pad - n,) + patches.shape[1:])])
                batches = _shard_batches(
                    patches.reshape((n_pad // bs, bs, ph, pw, 1)), mesh)
                preds = _map_batches(
                    lambda b: forward(apply_fn, dt, b, None, False, variables),
                    batches)

                starts_dev = jnp.asarray(starts)
                gidx_dev = jnp.asarray(grid_idx)
                result = {}
                for head, p in preds.items():
                    hp = p.reshape((-1,) + p.shape[2:])[:n].astype(jnp.float32)
                    fill = jnp.mean(hp)  # uncovered-pixel fill ≙ :279
                    framed = hp.reshape((n_frames, per) + hp.shape[1:])

                    def one(frame_patches):
                        out, wsum = _stitch_factored_xla(
                            frame_patches, facs, gidx_dev, starts_dev,
                            (out_h, out_w))
                        return jnp.where(wsum > 0,
                                         out / jnp.maximum(wsum, 1e-12), fill)

                    # f16 transfer: halves D2H bytes (the reference's own
                    # result patches are float16 — predict.py:189)
                    result[head] = jax.vmap(one)(framed).astype(jnp.float16)
                return result

            self._cache_put(_Engine._FUSED_CACHE, key, jax.jit(pipeline))
        fn = self._cache_get(_Engine._FUSED_CACHE, key)
        imgs_dev = _replicate_if_mesh(imgs_raw, mesh)
        args = ((self.variables, imgs_dev,
                 jnp.asarray(np.asarray(fixed_bounds, np.float32)))
                if fixed else (self.variables, imgs_dev))
        return self._dispatch_with_oom_backoff(
            fn, args, bs,
            lambda smaller: self.fused_predict_heads(
                imgs_raw, xs, ys, patch_size, clip_threshold, factors,
                fixed_bounds=fixed_bounds, _bs=smaller))

    def _dispatch_with_oom_backoff(self, fn, args, bs: int, retry):
        """Dispatch a fused program; if the chip runs out of HBM (compile- or
        run-time), halve the map-step batch and rebuild via ``retry`` — the
        raised batch caps saturate the MXU for the common models, and odd
        model/tile combinations degrade to a smaller batch instead of
        failing (the dense UNet++ at 32×512² tiles needs ~16 G of temps)."""
        try:
            return fn(*args)
        except Exception as exc:  # jaxlib error types vary by runtime
            floor = self.mesh.shape["data"] if self.mesh is not None else 1
            if not _is_oom_error(exc) or bs <= floor:
                raise
            smaller = max(floor, bs // 2)
            if self.mesh is not None:
                smaller = _round_up(smaller, floor)
            warnings.warn(
                f"fused program ran out of device memory at map batch {bs}; "
                f"retrying with batch {smaller} (larger batches saturate the "
                "MXU — see benchmarks/PROBE_HEADS_BREAKDOWN.json)",
                stacklevel=3)
            return retry(smaller)

    def fused_predict_volume(self, vol_raw: np.ndarray, zs, xs, ys,
                             resize_dim, clip_threshold, invert: bool):
        """Fused 3D predict (≙ unet3d/predict.py:119-195): the raw
        uint8/uint16 volume goes up in ONE transfer and one program does the
        whole-volume percentile normalization (per-volume bounds — the
        reference's 'all' mode over a single volume), reflect pad, 3-axis
        tiling, the batched 3D forward and mean-overlap stitch.  Returns the
        (out_d, out_h, out_w, 1) uint8 volume on device."""
        from ..ops.stitch import _stitch_xla_3d

        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8_3d(vol_raw, zs, xs, ys, resize_dim,
                                    clip_threshold, invert)
        d, h, w = vol_raw.shape
        tz, tx, ty = resize_dim
        out_d, out_h, out_w = max(tz, d), max(tx, h), max(ty, w)
        zs = tuple(int(v) for v in zs)
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        src_dtype = vol_raw.dtype
        n = len(zs) * len(xs) * len(ys)
        # 3D U-Net activations are deep: cap each lax.map step at ~8M tile
        # voxels
        mesh = self.mesh
        bs = max(self.batch_size, min(n, (1 << 23) // (tz * tx * ty)))
        if mesh is not None:
            bs = _round_up(bs, mesh.shape["data"])
        key = self._cache_key + ("fused_3d", d, h, w, tz, tx, ty, zs, xs, ys,
                                 tuple(clip_threshold), invert, bs,
                                 str(src_dtype)) + _mesh_key(mesh)
        if key not in _Engine._FUSED_CACHE:
            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nz, nx, ny = len(zs), len(xs), len(ys)
            n_pad = _round_up(n, bs)
            exact, idx_z, idx_x, idx_y = _tile_plan_3d(d, h, w, tz, tx, ty,
                                                       zs, xs, ys)
            n_bits = _src_nbits(src_dtype)
            gz, gx, gy = np.meshgrid(np.asarray(zs), np.asarray(xs),
                                     np.asarray(ys), indexing="ij")

            def pipeline(variables, vol):
                lo, hi, fmin, fmax = (
                    v[:, None, None, None]
                    for v in _device_frame_bounds(vol[None].reshape(1, -1),
                                                  clip_threshold, n_bits))
                f = _normalize_clip(vol[None].astype(jnp.float32),
                                    lo, hi, fmin, fmax, invert)
                pads = ((0, 0), (0, max(tz - d, 0)), (0, max(tx - h, 0)),
                        (0, max(ty - w, 0)))
                if any(p[1] for p in pads):
                    f = jnp.pad(f, pads, mode="reflect")
                u8 = f.astype(jnp.uint8)  # reference patch quantization
                patches = _extract_tiles_3d(u8, nz, nx, ny, tz, tx, ty,
                                            exact, idx_z, idx_x, idx_y)
                if n_pad != n:
                    patches = jnp.concatenate(
                        [patches, jnp.broadcast_to(patches[-1:],
                                                   (n_pad - n,) + patches.shape[1:])])
                batches = _shard_batches(
                    patches.reshape((n_pad // bs, bs, tz, tx, ty, 1)), mesh)
                probs = _map_batches(
                    lambda b: forward(apply_fn, dt, b, None, True, variables),
                    batches
                ).reshape((-1, tz, tx, ty, 1))[:n]
                if exact:  # inverse of the tiling transpose
                    return (probs.reshape(nz, nx, ny, tz, tx, ty)
                            .transpose(0, 3, 1, 4, 2, 5)
                            .reshape(nz * tz, nx * tx, ny * ty, 1))
                out, cnt = _stitch_xla_3d(
                    probs.astype(jnp.float32),
                    jnp.asarray(gz.ravel().astype(np.int32)),
                    jnp.asarray(gx.ravel().astype(np.int32)),
                    jnp.asarray(gy.ravel().astype(np.int32)),
                    out_d, out_h, out_w)
                return (out / jnp.maximum(cnt, 1.0)).astype(jnp.uint8)

            self._cache_put(_Engine._FUSED_CACHE, key, jax.jit(pipeline))
        fn = self._cache_get(_Engine._FUSED_CACHE, key)
        return fn(self.variables, _replicate_if_mesh(vol_raw, mesh))

    def fused_predict_heads_3d(self, vols_raw: np.ndarray, zs, xs, ys,
                               tile, clip_threshold, factors,
                               fixed_bounds: Optional[np.ndarray] = None,
                               _bs: Optional[int] = None):
        """Fused multi-head 3D predict (≙ multi_output_unet3d/predict.py:
        90-307): raw integer volumes up in one transfer, per-volume
        normalization to [0, 1] on device, overlap-stride tiling, multi-head
        forward and linear-blend stitch (per-axis ``factors`` tables — the
        dense blend-weight stack, hundreds of MB for big 3D grids, is never
        built).  Returns {head: (V, D, H, W, c) float16 device array} (the
        reference's result-patch dtype; callers cast to float32).

        ``fixed_bounds`` — (lo, hi, gmin, gmax) float32 — switches from
        per-volume ('single') normalization to stack-global bounds: the
        'first'/'all' modes of multi_output_unet3d/predict.py:114-121, whose
        percentiles are computed ONCE on host and threaded in as *traced*
        scalars (the 2D ``fused_predict_heads`` mechanism)."""
        if self._quant is not None and not self._quant_ready:
            self._calibrate_int8_3d(vols_raw, zs, xs, ys, tile,
                                    clip_threshold,
                                    fixed_bounds=fixed_bounds)
        n_vol, d, h, w = vols_raw.shape
        tz, tx, ty = tile
        zs = tuple(int(v) for v in zs)
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        src_dtype = vols_raw.dtype
        per = len(zs) * len(xs) * len(ys)
        n = n_vol * per
        mesh = self.mesh
        # 8M tile voxels per map step like the plain fused_predict_volume
        # (same 3D trunk, deep activations cap it below the 2D paths); the
        # old 4M cap under-filled the MXU (see PROBE_HEADS_BREAKDOWN.json
        # batch sweep for the 2D analog); OOM-backoff halves on odd
        # model/tile combinations
        bs = (_bs if _bs is not None
              else max(1, min(n, (1 << 23) // (tz * tx * ty))))
        if mesh is not None:
            bs = _round_up(bs, mesh.shape["data"])
        fixed = fixed_bounds is not None
        key = self._cache_key + ("fused_heads_3d", n_vol, d, h, w, tz, tx, ty,
                                 zs, xs, ys, tuple(clip_threshold), bs,
                                 str(src_dtype), fixed,
                                 tuple(np.asarray(f, np.float32).tobytes()
                                       for f in factors)) + _mesh_key(mesh)
        if key not in _Engine._FUSED_CACHE:
            from ..ops.stitch import _stitch_factored_xla

            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nz, nx, ny = len(zs), len(xs), len(ys)
            n_pad = _round_up(n, bs)
            exact, idx_z, idx_x, idx_y = _tile_plan_3d(d, h, w, tz, tx, ty,
                                                       zs, xs, ys)
            n_bits = _src_nbits(src_dtype)
            grids = np.meshgrid(np.asarray(zs), np.asarray(xs), np.asarray(ys),
                                indexing="ij")
            starts = np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)
            gidx = np.meshgrid(np.arange(nz), np.arange(nx), np.arange(ny),
                               indexing="ij")
            grid_idx = np.stack([g.ravel() for g in gidx], axis=1).astype(np.int32)
            facs = tuple(jnp.asarray(f) for f in factors)

            def pipeline(variables, vols, bounds=None):
                if bounds is not None:
                    # stack-global 'first'/'all' bounds as traced scalars
                    # (≙ multi_output_unet3d/predict.py:114-121)
                    lo, hi, fmin, fmax = (bounds[i] for i in range(4))
                else:
                    # per-VOLUME bounds — the reference's 'single' mode
                    # (multi_output_unet3d/predict.py:105-112 normalizes
                    # volume by volume)
                    lo, hi, fmin, fmax = (
                        v[:, None, None, None]
                        for v in _device_frame_bounds(vols.reshape(n_vol, -1),
                                                      clip_threshold, n_bits))
                f = _normalize_clip(vols.astype(jnp.float32), lo, hi,
                                    fmin, fmax, invert=False, scale=1.0)
                patches = _extract_tiles_3d(f, nz, nx, ny, tz, tx, ty,
                                            exact, idx_z, idx_x, idx_y)
                if n_pad != n:
                    patches = jnp.concatenate(
                        [patches, jnp.broadcast_to(patches[-1:],
                                                   (n_pad - n,) + patches.shape[1:])])
                batches = _shard_batches(
                    patches.reshape((n_pad // bs, bs, tz, tx, ty, 1)), mesh)
                preds = _map_batches(
                    lambda b: forward(apply_fn, dt, b, None, False, variables),
                    batches)

                starts_dev = jnp.asarray(starts)
                gidx_dev = jnp.asarray(grid_idx)
                result = {}
                for head, p in preds.items():
                    hp = p.reshape((-1,) + p.shape[2:])[:n].astype(jnp.float32)
                    framed = hp.reshape((n_vol, per) + hp.shape[1:])

                    def one(vol_patches):
                        out, wsum = _stitch_factored_xla(
                            vol_patches, facs, gidx_dev, starts_dev, (d, h, w))
                        return jnp.where(wsum > 0,
                                         out / jnp.maximum(wsum, 1e-12), 0.0)

                    # f16 transfer ≙ the reference's float16 result patches
                    result[head] = jax.vmap(one)(framed).astype(jnp.float16)
                return result

            self._cache_put(_Engine._FUSED_CACHE, key, jax.jit(pipeline))
        fn = self._cache_get(_Engine._FUSED_CACHE, key)
        vols_dev = _replicate_if_mesh(vols_raw, mesh)
        args = ((self.variables, vols_dev,
                 jnp.asarray(np.asarray(fixed_bounds, np.float32)))
                if fixed else (self.variables, vols_dev))
        return self._dispatch_with_oom_backoff(
            fn, args, bs,
            lambda smaller: self.fused_predict_heads_3d(
                vols_raw, zs, xs, ys, tile, clip_threshold, factors,
                fixed_bounds=fixed_bounds, _bs=smaller))

    @staticmethod
    def _pad_to(arr: np.ndarray, n_pad: int) -> np.ndarray:
        n = arr.shape[0]
        if n_pad == n:
            return arr
        pad = np.broadcast_to(arr[-1:], (n_pad - n,) + arr.shape[1:])
        return np.concatenate([arr, pad])

    def predict_patches(self, patches: np.ndarray, prev: Optional[np.ndarray] = None,
                        progress=None, quantize: bool = False,
                        return_device: bool = False):
        """Run (N, *tile, C) patches through the model.  uint8 inputs are
        normalized by 255 on device.  Returns uint8 probabilities·255 when
        ``quantize`` (single-head) else float16/float32 arrays or a per-head
        dict.  ``return_device`` keeps the result on device (single-head only)
        for downstream device-side stitching."""
        n = patches.shape[0]
        bs = self.batch_size
        chunk = self.CHUNK_BATCHES * bs
        n_pad = _round_up(n, chunk) if n > chunk else _round_up(n, bs)
        patches = self._pad_to(patches, n_pad)
        if prev is not None:
            prev = self._pad_to(prev, n_pad)
        runner = self._get_runner(prev is not None, quantize)

        # dispatch chunks asynchronously; host-bound results are fetched with
        # a bounded pending window (like the fused path) so device memory
        # stays O(window) on arbitrarily long inputs.  return_device callers
        # keep everything resident by design (their downstream stitch is
        # device-side and their own chunking bounds the size).
        pending = []
        done = []
        steps = list(range(0, n_pad, chunk))
        it = progress.iterator(steps) if progress is not None else steps
        def _put(arr):
            if self._batch_sharding is not None:
                return jax.device_put(arr, self._batch_sharding)
            return jnp.asarray(arr)

        for start in it:
            stop = min(start + chunk, n_pad)
            nb = (stop - start) // bs
            b = patches[start:stop].reshape((nb, bs) + patches.shape[1:])
            if prev is not None:
                pb = prev[start:stop].reshape((nb, bs) + prev.shape[1:])
                pending.append(runner(self.variables, _put(b), _put(pb)))
            else:
                pending.append(runner(self.variables, _put(b)))
            if not return_device and len(pending) > self.FUSED_PENDING_CHUNKS:
                done.append(jax.device_get(pending.pop(0)))
        if return_device:
            if isinstance(pending[0], dict):
                return {
                    k: (jnp.concatenate([c[k].reshape((-1,) + c[k].shape[2:])
                                         for c in pending])[:n]
                        if len(pending) > 1
                        else pending[0][k].reshape((-1,) + pending[0][k].shape[2:])[:n])
                    for k in pending[0]
                }
            flat = [p.reshape((-1,) + p.shape[2:]) for p in pending]
            return jnp.concatenate(flat)[:n] if len(flat) > 1 else flat[0][:n]
        chunks = done + [jax.device_get(p) for p in pending]
        if isinstance(chunks[0], dict):
            return {
                k: np.concatenate([c[k].reshape((-1,) + c[k].shape[2:]) for c in chunks])[:n]
                for k in chunks[0]
            }
        return np.concatenate([c.reshape((-1,) + c.shape[2:]) for c in chunks])[:n]



def _warn_quantized_host_path(quantized, engine, use_fused, fused_blocker):
    """quantized=True only runs inside the fused device pipeline — warn when
    the request fell back to the host-staged bf16/f32 path (shared by all
    five Predict classes)."""
    if not (quantized and engine._quant is not None and not use_fused):
        return
    import warnings

    reason = fused_blocker or "device_pipeline=False was forced"
    warnings.warn(
        "quantized=True runs only inside the fused device pipeline; "
        f"this request took the host-staged path ({reason}) "
        "and runs bf16/f32", stacklevel=3)

class Predict:
    """Tiled 2D prediction with mean-overlap stitching
    (reference unet/predict.py:14-229).

    ``imgs`` may be an array or a tif path; the network is rebuilt from the
    checkpoint's embedded hyperparams (unet/predict.py:83-101).  Results are
    uint8-quantized probabilities saved as float16 tif (utils/utils.py:8-22),
    also kept in ``self.result``.
    """

    def __init__(self, imgs, result_name, model_params, network=None,
                 resize_dim=(512, 512), invert=False, normalization_mode="single",
                 clip_threshold=(0.0, 99.8), add_tile=0, normalize_result=False,
                 show_progress=True, batch_size: int = 8, half_precision=False,
                 mesh=None, device=None, device_pipeline: Optional[bool] = None,
                 quantized: bool = False,
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(imgs, (str, os.PathLike)):
            imgs = tiff.imread(imgs)
        imgs = np.asarray(imgs)
        self.resize_dim = tuple(resize_dim)
        self.add_tile = add_tile
        self.result_name = result_name

        squeeze = imgs.ndim == 2
        if squeeze:
            imgs = imgs[None]
        self.imgs_shape = imgs.shape

        engine = _Engine(model_params, network, batch_size, half_precision,
                         mesh=mesh, quantized=quantized)
        in_ch = engine.hyperparams.get("in_channels", 1)
        out_ch = engine.hyperparams.get("out_channels", 1)
        if in_ch != 1:
            raise ValueError("tiled 2D Predict supports single-channel input")

        # device_pipeline: None (default) auto-enables the fused
        # normalize+tile+forward+stitch program whenever it can honor the
        # request exactly; True warns when it cannot (the user asked for the
        # fast path — a silent ~25× slower fallback would be a lie); False
        # forces the host-staged path.
        fused_blocker = None
        if out_ch != 1:
            fused_blocker = "multi-channel output (out_channels != 1)"
        elif not (imgs.dtype in (np.uint8, np.uint16)
                  or np.issubdtype(imgs.dtype, np.floating)):
            fused_blocker = (f"input dtype {imgs.dtype} (the fused program "
                             "normalizes uint8/uint16/float on device)")
        elif (np.issubdtype(imgs.dtype, np.floating)
              and device_pipeline is not False  # skip the O(n) scan when
              and np.isnan(imgs).any()):        # the host path is forced
            # the device percentile search would sort NaNs above +inf and
            # corrupt the upper clip bound; the host path's nanpercentile
            # handles them (reference semantics, unet/predict.py:122-150)
            fused_blocker = ("float input contains NaNs (handled by the "
                             "host nanpercentile path)")
        elif any(self.resize_dim[a] - imgs.shape[a + 1] >= imgs.shape[a + 1]
                 for a in range(2)):
            fused_blocker = ("tile more than 2× the frame extent (XLA "
                             "reflect pad cannot exceed the axis size)")
        use_fused = _resolve_device_pipeline(device_pipeline, fused_blocker)
        _warn_quantized_host_path(quantized, engine, use_fused,
                                  fused_blocker)

        if use_fused:
            if (np.issubdtype(imgs.dtype, np.floating)
                    and imgs.dtype != np.float32):
                # normalize float16/float64 movies in float32 on device
                # (documented divergence: the host path computes in float64;
                # the difference is below the uint8 mask quantization)
                imgs = imgs.astype(np.float32)
            fixed_bounds = None
            if normalization_mode in ("first", "all"):
                # stack-global bounds, once, on host (O(n) bincount); the
                # chunk program receives them as traced scalars
                ref = imgs[0] if normalization_mode == "first" else imgs
                lo = _percentile(ref, clip_threshold[0])
                hi = _percentile(ref, clip_threshold[1])
                # post-clip stack extremes are provably (lo, hi): stack min
                # <= frame-0/stack min <= lo and stack max >= hi, so the two
                # O(n_frames·H·W) min/max scans always returned lo/hi
                fixed_bounds = np.array([lo, hi, lo, hi], np.float32)
            elif normalization_mode != "single":
                raise ValueError(f"normalization_mode {normalization_mode} not valid!")
            xs = grid_starts(self.imgs_shape[1], self.resize_dim[0], add_tile)
            ys = grid_starts(self.imgs_shape[2], self.resize_dim[1], add_tile)
            progress = progress_notifier if (show_progress and progress_notifier) else (
                ProgressNotifier.progress_notifier_tqdm() if show_progress else None
            )
            if show_progress:
                print("Predicting data ...")
            result = engine.fused_predict_frames(
                imgs, xs, ys, self.resize_dim, clip_threshold, invert,
                progress=progress, fixed_bounds=fixed_bounds,
            )[..., 0]
            self.result = np.squeeze(result)
            if result_name is not None:
                save_as_tif(self.result, result_name, normalize=normalize_result)
            return

        imgs = _normalize_stack(imgs, normalization_mode, clip_threshold, invert)

        patches, xs, ys = self._split(imgs)
        progress = progress_notifier if (show_progress and progress_notifier) else (
            ProgressNotifier.progress_notifier_tqdm() if show_progress else None
        )
        if show_progress:
            print("Predicting data ...")
        probs = engine.predict_patches(patches[..., None], progress=progress,
                                       quantize=True,  # uint8·255 ≙ reference
                                       return_device=True)
        del patches

        # stitch the whole movie ON DEVICE in one dispatch — only the
        # stitched uint8 frames cross back to the host
        from ..ops.stitch import stitch_mean_frames_device

        n_frames = self.imgs_shape[0]
        out_h = max(self.resize_dim[0], self.imgs_shape[1])
        out_w = max(self.resize_dim[1], self.imgs_shape[2])
        result = np.asarray(stitch_mean_frames_device(
            probs, n_frames, (xs, ys), (out_h, out_w), quantize_u8=True))
        result = result[:, : self.imgs_shape[1], : self.imgs_shape[2]]
        if out_ch == 1:
            result = result[..., 0]
        else:
            result = np.moveaxis(result, -1, 1)  # (N, C, H, W) like the reference
        self.result = np.squeeze(result)
        if result_name is not None:
            save_as_tif(self.result, result_name, normalize=normalize_result)

    def _split(self, imgs):
        h, w = self.imgs_shape[1], self.imgs_shape[2]
        xs = grid_starts(h, self.resize_dim[0], self.add_tile)
        ys = grid_starts(w, self.resize_dim[1], self.add_tile)
        if self.resize_dim[0] > h:
            imgs = np.pad(imgs, ((0, 0), (0, self.resize_dim[0] - h), (0, 0)), "reflect")
        if self.resize_dim[1] > w:
            imgs = np.pad(imgs, ((0, 0), (0, 0), (0, self.resize_dim[1] - w)), "reflect")
        # uint8 patch buffer ≙ unet/predict.py:160 (quantization is part of
        # the reference's numeric contract)
        patches = np.empty(
            (self.imgs_shape[0] * len(xs) * len(ys),) + self.resize_dim, dtype=np.uint8
        )
        n = 0
        for img in imgs:
            for x0 in xs:
                for y0 in ys:
                    patches[n] = img[x0 : x0 + self.resize_dim[0], y0 : y0 + self.resize_dim[1]]
                    n += 1
        return patches, xs, ys


class PredictSiam:
    """Streaming movie predictor (reference siam_unet/predict.py:15-240):
    frames are read incrementally, paired with the previous frame (frame 0
    pairs with frame 1), tiled, predicted, stitched, and appended to the
    output TIFF — bounded memory for arbitrarily long movies.

    TPU redesign: frames stream in chunks of ``frames_per_chunk`` so each
    device dispatch carries many frames' patches (one dispatch per frame
    pays full round-trip latency on remote TPUs); stitching is fused
    on-device per chunk.  Memory stays bounded by the chunk.

    ``quantized=True`` (w8a8 int8): activation scales are calibrated on a
    pre-pass that decodes ``_Engine._QUANT_CAL_FRAMES`` pairs evenly spaced
    across the WHOLE movie (same sampling the in-memory paths use) before
    streaming starts, so a brightness distribution that drifts away from
    the opening frames still calibrates correctly; the decoded pages are
    kept and reused when the stream reaches them.  Float32 pages are fused
    only on explicit ``device_pipeline=True`` (NaN pages cannot be
    pre-screened when streaming; one raises mid-stream)."""

    def __init__(self, tif_file, result_name, model_params, resize_dim=(512, 512),
                 invert=False, normalization_mode="single", clip_threshold=(0.0, 99.98),
                 add_tile=0, normalize_result=False, show_progress=True,
                 batch_size: int = 8, half_precision=False, mesh=None, device=None,
                 frames_per_chunk: int = 8, device_pipeline: Optional[bool] = None,
                 quantized: bool = False,
                 progress_notifier: ProgressNotifier = None):
        del device
        self.invert = invert
        self.normalization_mode = normalization_mode
        self.clip_threshold = clip_threshold

        engine = _Engine(model_params, "Siam_UNet", batch_size, half_precision,
                         mesh=mesh, quantized=quantized)

        reader = tiff.TiffReader(tif_file)
        n_frames = reader.n_pages
        frame_shape = reader.page_shape(0)
        self.imgs_shape = (n_frames,) + tuple(frame_shape)

        if resize_dim is None:  # whole-frame mode (siam_unet/predict.py:82-85)
            resize_dim = frame_shape
        self.resize_dim = tuple(resize_dim)
        xs = grid_starts(frame_shape[0], self.resize_dim[0], add_tile)
        ys = grid_starts(frame_shape[1], self.resize_dim[1], add_tile)
        per = len(xs) * len(ys)
        out_h = max(self.resize_dim[0], frame_shape[0])
        out_w = max(self.resize_dim[1], frame_shape[1])

        # an invalid mode must raise on EVERY path (host and fused alike —
        # the fused pair program's 'else' branch would otherwise silently
        # run a typo as 'all'; reference siam_unet/predict.py semantics)
        if normalization_mode not in ("single", "first", "all"):
            reader.close()
            raise ValueError(
                f"normalization_mode {normalization_mode} not valid!")
        # fused path eligibility (same contract as Predict.device_pipeline):
        # page 0 is decoded once here and reused as the first chunk's frame
        page0 = np.asarray(reader.read_page(0))
        fused_blocker = None
        if page0.dtype not in (np.uint8, np.uint16):
            if (np.issubdtype(page0.dtype, np.floating)
                    and device_pipeline is True):
                # float movies are fused ONLY on explicit opt-in: the
                # streaming reader cannot pre-screen later pages for NaNs
                # (which corrupt the device percentile search), so a NaN page
                # mid-stream raises instead of silently degrading
                if np.isnan(page0).any():
                    fused_blocker = ("page 0 contains NaNs (handled by the "
                                     "host nanpercentile path)")
            else:
                fused_blocker = (
                    f"page dtype {page0.dtype} (the auto device pipeline "
                    "streams uint8/uint16; NaN-free float movies opt in "
                    "with device_pipeline=True)")
        use_fused = _resolve_device_pipeline(device_pipeline, fused_blocker)
        _warn_quantized_host_path(quantized, engine, use_fused,
                                  fused_blocker)

        if show_progress:
            print("Predicting data ...")
        it = range(0, n_frames, frames_per_chunk)
        if show_progress:
            notifier = progress_notifier or ProgressNotifier.progress_notifier_tqdm()
            it = notifier.iterator(it, total=int(np.ceil(n_frames / frames_per_chunk)))

        from ..ops.stitch import stitch_mean_frames_device

        page_cache = {0: page0}

        def read_page(i):
            if i in page_cache:
                return page_cache.pop(i)
            return reader.read_page(i)

        if use_fused and engine._quant is not None and not engine._quant_ready:
            # movie-spanning int8 calibration pre-pass: the in-memory paths
            # sample calibration frames evenly across the whole stack; a
            # streaming movie used to calibrate on its FIRST chunk only and
            # could saturate when brightness drifts in later (advisor
            # finding, round 3).  Decode the sampled pairs once here and
            # seed the page cache so the stream reuses the decodes.
            cur_idx = np.unique(np.linspace(
                0, n_frames - 1, engine._QUANT_CAL_FRAMES).round().astype(int))

            def cal_page(i):
                if i not in page_cache:
                    page_cache[i] = np.asarray(reader.read_page(i))
                return page_cache[i]

            curs = np.stack([cal_page(int(i)) for i in cur_idx])
            # pair i = (prev=frame i-1, cur=frame i); frame 0 pairs with
            # frame 1 (reference siam_unet/predict.py frame-0 semantics)
            prevs = np.stack([cal_page(int(i) - 1 if i > 0
                                       else min(1, n_frames - 1))
                              for i in cur_idx])
            for planes in (curs, prevs):
                if (np.issubdtype(planes.dtype, np.floating)
                        and np.isnan(planes).any()):
                    # fail before anything is written: NaN pages violate the
                    # opt-in fused-float contract, and calibrating on them
                    # would silently poison every chunk's int8 scales
                    reader.close()
                    raise ValueError(
                        "NaN in a sampled calibration page: the opt-in "
                        "fused float pipeline requires NaN-free data — "
                        "rerun with device_pipeline=False")
            engine._calibrate_int8(curs, xs, ys, self.resize_dim,
                                   clip_threshold, invert, prev_u8=prevs,
                                   pair_mode=normalization_mode)

        last_page = None
        pending = None  # (device chunk output, real frame count)

        def flush(writer):
            if pending is None:
                return
            for frame in np.asarray(jax.device_get(pending[0]))[: pending[1]]:
                writer.write(frame[: frame_shape[0], : frame_shape[1], 0])

        # the full output geometry is known upfront: pick BigTIFF when the
        # streamed uint8 masks will not fit classic-TIFF's 4 GiB offsets
        # (the reference's TiffWriter(bigtiff=False) just crashes there)
        out_bytes = n_frames * (int(frame_shape[0]) * int(frame_shape[1]) + 256)
        with tiff.TiffWriter(result_name,
                             bigtiff=out_bytes > 0xFFFFFFFF - (1 << 20)) as writer:
            for start in it:
                stop = min(start + frames_per_chunk, n_frames)
                k = stop - start
                if use_fused:
                    # per-frame host work is ONLY the TIFF page decode: the
                    # (k+1)-frame raw block goes up in one transfer and one
                    # program does normalize+tile+forward+stitch on device
                    frames_raw = [np.asarray(read_page(i))
                                  for i in range(start, stop)]
                    if start == 0:
                        if k > 1:
                            prev0 = frames_raw[1]
                        elif n_frames > 1:
                            prev0 = np.asarray(read_page(1))
                            # the next chunk starts at page 1 — keep the
                            # decode (frames_per_chunk=1 would otherwise pay
                            # the host TIFF decode twice for page 1)
                            page_cache[1] = prev0
                        else:
                            prev0 = frames_raw[0]
                    else:
                        prev0 = last_page
                    last_page = frames_raw[-1]
                    block = np.stack([prev0] + frames_raw)
                    if np.issubdtype(block.dtype, np.floating):
                        if np.isnan(block).any():
                            # save everything already computed, release the
                            # reader, THEN raise — the message must not
                            # overstate (or understate) what landed on disk.
                            # Name the ACTUAL offending pages: the block also
                            # carries prev0, which on the very first chunk is
                            # page 1 (frame-0 pairing) — without checking it
                            # separately a NaN living only there would be
                            # misreported as page `start` (review finding)
                            bad = {i for i, fr in
                                   enumerate(frames_raw, start=start)
                                   if np.isnan(fr).any()}
                            if start == 0 and np.isnan(prev0).any():
                                bad.add(1 if n_frames > 1 else 0)
                            flush(writer)
                            pending = None
                            reader.close()
                            raise ValueError(
                                f"NaN in page(s) "
                                f"{', '.join(map(str, sorted(bad)))}: the "
                                "opt-in fused float pipeline requires "
                                "NaN-free data — rerun with "
                                f"device_pipeline=False (the first {start} "
                                f"result pages are already in {result_name})")
                        if block.dtype != np.float32:
                            block = block.astype(np.float32)
                    if k < frames_per_chunk:  # tail: keep the program shape
                        block = np.concatenate(
                            [block, np.broadcast_to(
                                block[-1:], (frames_per_chunk - k,) + block.shape[1:])])
                    out_dev = engine.fused_predict_pairs(
                        block, xs, ys, self.resize_dim, clip_threshold,
                        invert, normalization_mode)
                    try:
                        # start the D2H copy early: with the one-chunk lag
                        # below, downloads overlap the next chunk's
                        # upload+compute (the tunnel link is full-duplex)
                        out_dev.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass
                    flush(writer)
                    pending = (out_dev, k)
                    continue
                patches = np.empty((k * per,) + self.resize_dim, dtype=np.uint8)
                prev_patches = np.empty_like(patches)
                for j, i in enumerate(range(start, stop)):
                    # each page is decoded once: the previous iteration's
                    # current frame is reused as this frame's prev
                    current = read_page(i)
                    if i == 0:
                        if n_frames == 1:
                            prev = current
                        else:
                            prev = np.asarray(read_page(1))
                            # keep the decode: iteration i==1 pops it as its
                            # 'current' instead of decoding page 1 again
                            # (mirrors the fused branch at the
                            # frames_per_chunk=1 boundary)
                            page_cache[1] = prev
                    else:
                        # chunks iterate contiguously from 0, so the
                        # previous iteration's current frame is always here
                        prev = last_page
                    last_page = current
                    # keep the source dtype: integer frames take the exact
                    # bincount percentile fast path inside _normalize_stack.
                    # NB: 'first'/'all' apply per frame-PAIR ('first' = the
                    # prev frame, 'all' = the pair) — exactly the reference's
                    # semantics (siam_unet/predict.py:117-118 builds
                    # [prev, current] inside the frame loop and __preprocess
                    # takes its percentiles from that 2-frame stack)
                    pair = _normalize_stack(
                        np.stack([np.asarray(prev), np.asarray(current)]),
                        normalization_mode, clip_threshold, invert,
                    ).astype(np.uint8)
                    p, pp = self._split_pair(pair, xs, ys)
                    patches[j * per : (j + 1) * per] = p
                    prev_patches[j * per : (j + 1) * per] = pp
                probs = engine.predict_patches(
                    patches[..., None], prev_patches[..., None], quantize=True,
                    return_device=True,
                )
                frames = np.asarray(stitch_mean_frames_device(
                    probs, k, (xs, ys), (out_h, out_w), quantize_u8=True))
                for frame in frames:
                    writer.write(frame[: frame_shape[0], : frame_shape[1], 0])
            flush(writer)  # drain the lagged fused chunk
        reader.close()
        self.result_name = result_name

    def _split_pair(self, pair, xs, ys):
        h, w = pair.shape[1], pair.shape[2]
        # constant (zero) padding for small frames (siam_unet/predict.py:168-180)
        if self.resize_dim[0] > h:
            pair = np.pad(pair, ((0, 0), (0, self.resize_dim[0] - h), (0, 0)))
        if self.resize_dim[1] > w:
            pair = np.pad(pair, ((0, 0), (0, 0), (0, self.resize_dim[1] - w)))
        n = len(xs) * len(ys)
        patches = np.empty((n,) + self.resize_dim, dtype=np.uint8)
        prev_patches = np.empty_like(patches)
        k = 0
        for x0 in xs:
            for y0 in ys:
                sl = (slice(x0, x0 + self.resize_dim[0]), slice(y0, y0 + self.resize_dim[1]))
                patches[k] = pair[1][sl]
                prev_patches[k] = pair[0][sl]
                k += 1
        return patches, prev_patches


class Predict3D:
    """Tiled 3D prediction (reference unet3d/predict.py:12-195): 3-axis
    linspace grid over a (Z, X, Y) volume, whole-volume normalization,
    mean-overlap stitching.

    ``normalization_mode`` is accepted in the reference's position for
    drop-in signature parity and — like the reference itself — has no effect:
    unet3d/predict.py:53 takes the kwarg but its ``__preprocess``
    (:110-117) normalizes with the WHOLE volume's percentiles regardless of
    the mode, and so does this class (on device, in the fused path)."""

    def __init__(self, vol, result_name, model_params, network="UNet3D",
                 resize_dim=(64, 128, 128), invert=False,
                 normalization_mode="single", clip_threshold=(0.0, 99.8),
                 add_patch=0, normalize_result=False, show_progress=True,
                 batch_size: int = 4, half_precision=False, mesh=None, device=None,
                 device_pipeline: Optional[bool] = None,
                 quantized: bool = False,
                 progress_notifier: ProgressNotifier = None):
        del device, normalization_mode  # accepted-and-ignored ≙ reference
        if isinstance(vol, (str, os.PathLike)):
            vol = tiff.imread(vol)
        vol = np.asarray(vol)  # raw dtype kept: the fused path uploads ints
        self.vol_shape = vol.shape
        self.resize_dim = tuple(resize_dim)

        engine = _Engine(model_params, network, batch_size, half_precision,
                         mesh=mesh, quantized=quantized)

        # add_patch adds ONE extra grid row per axis, z included (the
        # reference intends the same — unet3d/predict.py:121 computes
        # N_z = ceil + add_patch — but its :122-126 then accumulate
        # add_patch into N_x up to three times, once under a condition that
        # reads N_z; documented divergence: we apply it exactly once per
        # axis, the unet/predict.py:154-172 semantics every other grid here
        # follows)
        zs = grid_starts(self.vol_shape[0], self.resize_dim[0], add_patch)
        xs = grid_starts(self.vol_shape[1], self.resize_dim[1], add_patch)
        ys = grid_starts(self.vol_shape[2], self.resize_dim[2], add_patch)
        n_vox = (len(zs) * len(xs) * len(ys)
                 * int(np.prod(self.resize_dim)))

        fused_blocker = None
        if not (vol.dtype in (np.uint8, np.uint16)
                or np.issubdtype(vol.dtype, np.floating)):
            fused_blocker = (f"input dtype {vol.dtype} (the fused program "
                             "normalizes uint8/uint16/float on device)")
        elif (np.issubdtype(vol.dtype, np.floating)
              and device_pipeline is not False  # skip the O(n) scan when
              and np.isnan(vol).any()):         # the host path is forced
            fused_blocker = ("float input contains NaNs (handled by the "
                             "host nanpercentile path)")
        elif n_vox > _Engine.FUSED_HEADS_MAX_PX:
            fused_blocker = (f"{n_vox} patch voxels exceed the "
                             "single-program budget")
        elif any(self.resize_dim[a] - self.vol_shape[a] >= self.vol_shape[a]
                 for a in range(3)):
            fused_blocker = ("tile more than 2× the volume extent (XLA "
                             "reflect pad cannot exceed the axis size)")
        use_fused = _resolve_device_pipeline(device_pipeline, fused_blocker)

        _warn_quantized_host_path(quantized, engine, use_fused,
                                  fused_blocker)

        if show_progress:
            print("Predicting data ...")
        if use_fused:
            if (np.issubdtype(vol.dtype, np.floating)
                    and vol.dtype != np.float32):
                vol = vol.astype(np.float32)  # device-normalized in f32
            # the fused path is ONE dispatch: tick any caller notifier once
            # so notifier-driven UIs still start and complete
            for _ in _single_tick(progress_notifier, show_progress):
                result = np.asarray(engine.fused_predict_volume(
                    vol, zs, xs, ys, self.resize_dim, clip_threshold, invert))
            self.result = result[: self.vol_shape[0], : self.vol_shape[1],
                                 : self.vol_shape[2], 0]
            if result_name is not None:
                save_as_tif(self.result, result_name, normalize=normalize_result)
            return

        # whole-volume normalization only (unet3d/predict.py:109-117)
        vol = _normalize_stack(vol.astype(np.float32)[None], "all",
                               clip_threshold, invert)[0]
        pads = [max(0, self.resize_dim[a] - self.vol_shape[a]) for a in range(3)]
        vol = np.pad(vol, [(0, p) for p in pads], "reflect")

        patches = np.empty((len(zs) * len(xs) * len(ys),) + self.resize_dim,
                           dtype=np.uint8)
        n = 0
        for z0 in zs:
            for x0 in xs:
                for y0 in ys:
                    patches[n] = vol[z0 : z0 + self.resize_dim[0],
                                     x0 : x0 + self.resize_dim[1],
                                     y0 : y0 + self.resize_dim[2]]
                    n += 1

        progress = progress_notifier if (show_progress and progress_notifier) else (
            ProgressNotifier.progress_notifier_tqdm() if show_progress else None
        )
        probs = engine.predict_patches(patches[..., None], progress=progress,
                                       quantize=True, return_device=True)

        # stitch on device: one dispatch, only the volume transfers back
        from ..ops.stitch import stitch_mean_device_3d

        out_shape = tuple(max(self.resize_dim[a], self.vol_shape[a]) for a in range(3))
        result = np.asarray(stitch_mean_device_3d(probs, (zs, xs, ys), out_shape,
                                                  quantize_u8=True))
        self.result = result[: self.vol_shape[0], : self.vol_shape[1],
                             : self.vol_shape[2], 0]
        if result_name is not None:
            save_as_tif(self.result, result_name, normalize=normalize_result)


class PredictMultiOutput:
    """Multi-head tiled 2D prediction (reference
    multi_output_unet/predict.py:13-285): /16-rounded adaptive patch size,
    batched inference, safe-margin stitch, per-head float32 results saved as
    ``<head>_<result_path>``-style tifs or kept in ``self.result``."""

    def __init__(self, imgs, model_params, result_path=None, network=None,
                 max_patch_size=(1024, 1024), batch_size=8,
                 normalization_mode="single", clip_threshold=(0.0, 99.98),
                 add_tile=0, compress_tif=False, show_progress=True,
                 half_precision=False, safe_margin: int = 20, mesh=None, device=None,
                 device_pipeline: Optional[bool] = None,
                 quantized: bool = False,
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(imgs, (str, os.PathLike)):
            imgs = tiff.imread(imgs)
        imgs = np.asarray(imgs)  # raw dtype kept: the fused path uploads ints
        squeeze = imgs.ndim == 2
        if squeeze:
            imgs = imgs[None]
        self.imgs_shape = imgs.shape

        engine = _Engine(model_params, network, batch_size, half_precision,
                         mesh=mesh, quantized=quantized)
        heads = engine.hyperparams["output_heads"]
        self.target_keys = list(heads)

        # /16-rounded patch size (multi_output_unet/predict.py:153-162)
        ph = _round_up(min(self.imgs_shape[1], max_patch_size[0]), 16)
        pw = _round_up(min(self.imgs_shape[2], max_patch_size[1]), 16)
        self.patch_size = (ph, pw)
        out_h = max(ph, self.imgs_shape[1])
        out_w = max(pw, self.imgs_shape[2])
        # documented divergence: patches are EXTRACTED at the same linspace
        # starts they are stitched back to.  The reference extracts with
        # sliding_window_view strided by X_start[1] (multi_output_unet/
        # predict.py:180-181) but stitches at the full linspace X_start —
        # for truncated linspace grids (non-uniform integer spacing, e.g.
        # add_tile > 0 with N >= 3) its patch contents and stitch positions
        # disagree by pixels; here both use the identical start vectors
        xs = grid_starts(out_h, ph, add_tile)
        ys = grid_starts(out_w, pw, add_tile)
        n_px = self.imgs_shape[0] * len(xs) * len(ys) * ph * pw

        from .tiling import _margin_weights

        fused_blocker = None
        if not (imgs.dtype in (np.uint8, np.uint16)
                or np.issubdtype(imgs.dtype, np.floating)):
            fused_blocker = (f"input dtype {imgs.dtype} (the fused program "
                             "normalizes uint8/uint16/float on device)")
        elif (np.issubdtype(imgs.dtype, np.floating)
              and device_pipeline is not False  # skip the O(n) scan when
              and np.isnan(imgs).any()):        # the host path is forced
            fused_blocker = ("float input contains NaNs (handled by the "
                             "host nanpercentile path)")
        elif n_px > _Engine.FUSED_HEADS_MAX_PX:
            fused_blocker = (f"{n_px} patch pixels exceed the single-program "
                             "budget (the uncovered-pixel fill is a "
                             "whole-stack statistic)")
        elif (ph - self.imgs_shape[1] >= self.imgs_shape[1]
              or pw - self.imgs_shape[2] >= self.imgs_shape[2]):
            fused_blocker = ("patch more than 2× the frame extent (XLA "
                             "reflect pad cannot exceed the axis size)")
        use_fused = _resolve_device_pipeline(device_pipeline, fused_blocker)
        _warn_quantized_host_path(quantized, engine, use_fused,
                                  fused_blocker)

        if show_progress:
            print("Predicting data ...")
        if use_fused:
            if (np.issubdtype(imgs.dtype, np.floating)
                    and imgs.dtype != np.float32):
                imgs = imgs.astype(np.float32)  # device-normalized in f32
            fixed_bounds = None
            if normalization_mode in ("first", "all"):
                ref = imgs[0] if normalization_mode == "first" else imgs
                lo = _percentile(ref, clip_threshold[0])
                hi = _percentile(ref, clip_threshold[1])
                # post-clip stack extremes are provably (lo, hi): the stack
                # min is <= its own (sub)stack's lo percentile and the max
                # >= hi, so the clip always lands on the bounds themselves —
                # no O(n) min/max scans needed
                fixed_bounds = np.array([lo, hi, lo, hi], np.float32)
            elif normalization_mode != "single":
                raise ValueError(f"normalization_mode {normalization_mode} not valid!")
            from .tiling import _margin_factors

            factors = _margin_factors((len(xs), len(ys)), (ph, pw), safe_margin)
            for _ in _single_tick(progress_notifier, show_progress):
                preds = engine.fused_predict_heads(
                    imgs, xs, ys, (ph, pw), clip_threshold, factors,
                    fixed_bounds=fixed_bounds)
                preds = {k: np.asarray(v) for k, v in preds.items()}
        else:
            imgs = _normalize_stack(imgs.astype(np.float32), normalization_mode,
                                    clip_threshold, scale=1.0)
            pad_x = max(ph - self.imgs_shape[1], 0)
            pad_y = max(pw - self.imgs_shape[2], 0)
            imgs = np.pad(imgs, ((0, 0), (0, pad_x), (0, pad_y)), "reflect")

            patches = np.empty((self.imgs_shape[0] * len(xs) * len(ys), ph, pw),
                               dtype=np.float32)
            n = 0
            for img in imgs:
                for x0 in xs:
                    for y0 in ys:
                        patches[n] = img[x0 : x0 + ph, y0 : y0 + pw]
                        n += 1

            progress = progress_notifier if (show_progress and progress_notifier) else (
                ProgressNotifier.progress_notifier_tqdm() if show_progress else None
            )
            raw_preds = engine.predict_patches(patches[..., None], progress=progress,
                                               return_device=True)

            # safe-margin stitch ON DEVICE, frames fused into one dispatch per head
            from ..ops.stitch import stitch_weighted_frames_device

            weights = _margin_weights((len(xs), len(ys)), (ph, pw), safe_margin)
            preds = {
                key: stitch_weighted_frames_device(
                    raw_preds[key], weights, (xs, ys), self.imgs_shape[0],
                    (out_h, out_w), fill_mean=True)
                for key in self.target_keys
            }

        self.result = {}
        for key in self.target_keys:
            r = np.asarray(preds[key])[:, : self.imgs_shape[1], : self.imgs_shape[2]]
            if r.shape[-1] > 1:
                r = np.moveaxis(r, -1, 1)  # (N, C, H, W) like the reference
            else:
                r = r[..., 0]
            self.result[key] = np.squeeze(r).astype(np.float32)
            if result_path is not None:
                os.makedirs(result_path, exist_ok=True)
                tiff.imwrite(os.path.join(result_path, f"{key}.tif"),
                             self.result[key],
                             compress=6 if compress_tif else None)


class PredictMultiOutput3D:
    """Multi-head 3D prediction (reference
    multi_output_unet3d/predict.py:13-307): overlap_factor stride grid,
    linear blend-margin stitch, per-head volumes."""

    def __init__(self, imgs, model_params, result_path=None, network=None,
                 max_patch_size=(64, 256, 256), overlap_factor=0.1, batch_size=2,
                 normalization_mode="single", clip_threshold=(0.0, 99.98),
                 add_tile=0, compress_tif=False, show_progress=True,
                 half_precision=False, blend_margin: int = 16, mesh=None, device=None,
                 device_pipeline: Optional[bool] = None,
                 quantized: bool = False,
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(imgs, (str, os.PathLike)):
            imgs = tiff.imread(imgs)
        imgs = np.asarray(imgs)  # raw dtype kept: the fused path uploads ints
        if imgs.ndim == 3:
            imgs = imgs[None]  # (n_volumes, Z, X, Y)
        self.imgs_shape = imgs.shape

        engine = _Engine(model_params, network, batch_size, half_precision,
                         mesh=mesh, quantized=quantized)
        heads = engine.hyperparams["output_heads"]
        self.target_keys = list(heads)

        if normalization_mode not in ("single", "first", "all"):
            raise ValueError(f"normalization_mode {normalization_mode} not valid!")
        n_vol, d, h, w = imgs.shape
        tile = tuple(min(s, m) for s, m in zip((d, h, w), max_patch_size))
        self.patch_size = tile
        zs = overlap_starts(d, tile[0], overlap_factor)
        xs = overlap_starts(h, tile[1], overlap_factor)
        ys = overlap_starts(w, tile[2], overlap_factor)
        n_vox = n_vol * len(zs) * len(xs) * len(ys) * int(np.prod(tile))

        fused_blocker = None
        if not (imgs.dtype in (np.uint8, np.uint16)
                or np.issubdtype(imgs.dtype, np.floating)):
            fused_blocker = (f"input dtype {imgs.dtype} (the fused program "
                             "normalizes uint8/uint16/float on device)")
        elif (np.issubdtype(imgs.dtype, np.floating)
              and device_pipeline is not False  # skip the O(n) scan when
              and np.isnan(imgs).any()):        # the host path is forced
            fused_blocker = ("float input contains NaNs (handled by the "
                             "host nanpercentile path)")
        elif n_vox > _Engine.FUSED_HEADS_MAX_PX:
            fused_blocker = (f"{n_vox} patch voxels exceed the "
                             "single-program budget")
        use_fused = _resolve_device_pipeline(device_pipeline, fused_blocker)

        _warn_quantized_host_path(quantized, engine, use_fused,
                                  fused_blocker)

        if show_progress:
            print("Predicting data ...")
        if use_fused:
            if (np.issubdtype(imgs.dtype, np.floating)
                    and imgs.dtype != np.float32):
                imgs = imgs.astype(np.float32)  # device-normalized in f32
            fixed_bounds = None
            if normalization_mode in ("first", "all"):
                # stack-global bounds (≙ multi_output_unet3d/predict.py:
                # 114-121: volume-0's or the whole stack's percentiles apply
                # to EVERY volume), computed once on host and threaded into
                # the fused program as traced scalars.  Post-clip stack
                # extremes are provably (lo, hi): stack min <= ref min <= lo
                # and stack max >= ref max >= hi (same argument as the 2D
                # fused paths)
                ref = imgs[0] if normalization_mode == "first" else imgs
                lo = _percentile(ref, clip_threshold[0])
                hi = _percentile(ref, clip_threshold[1])
                fixed_bounds = np.array([lo, hi, lo, hi], np.float32)
            from .tiling import _blend_factors

            factors = _blend_factors((len(zs), len(xs), len(ys)), tile,
                                     blend_margin)
            for _ in _single_tick(progress_notifier, show_progress):
                preds = engine.fused_predict_heads_3d(
                    imgs, zs, xs, ys, tile, clip_threshold, factors,
                    fixed_bounds=fixed_bounds)
                preds = {k: np.asarray(v) for k, v in preds.items()}
        else:
            # reference normalization semantics over the (N, D, H, W) stack
            # (multi_output_unet3d/predict.py:104-125): 'single' per volume,
            # 'first'/'all' with stack-global bounds — _normalize_stack's
            # axis-0 elements ARE the volumes here
            imgs = _normalize_stack(imgs.astype(np.float32),
                                    normalization_mode, clip_threshold,
                                    scale=1.0)

            patches = []
            for v in range(n_vol):
                for z0 in zs:
                    for x0 in xs:
                        for y0 in ys:
                            patches.append(imgs[v, z0 : z0 + tile[0], x0 : x0 + tile[1],
                                                y0 : y0 + tile[2]])
            patches = np.stack(patches)[..., None]

            progress = progress_notifier if (show_progress and progress_notifier) else (
                ProgressNotifier.progress_notifier_tqdm() if show_progress else None
            )
            raw_preds = engine.predict_patches(patches, progress=progress,
                                               return_device=True)

            # linear-blend stitch ON DEVICE, volumes fused into one dispatch
            # per head
            from ..ops.stitch import stitch_weighted_frames_device
            from .tiling import _blend_weights

            weights = _blend_weights((len(zs), len(xs), len(ys)), tile,
                                     blend_margin)
            preds = {
                key: stitch_weighted_frames_device(
                    raw_preds[key], weights, (zs, xs, ys), n_vol, (d, h, w),
                    fill_mean=False)
                for key in self.target_keys
            }

        self.result = {}
        for key in self.target_keys:
            r = np.asarray(preds[key])
            if r.shape[-1] > 1:
                r = np.moveaxis(r, -1, 1)
            else:
                r = r[..., 0]
            self.result[key] = np.squeeze(r).astype(np.float32)
            if result_path is not None:
                os.makedirs(result_path, exist_ok=True)
                tiff.imwrite(os.path.join(result_path, f"{key}.tif"),
                             self.result[key],
                             compress=6 if compress_tif else None)
