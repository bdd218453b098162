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
                 half_precision: bool = False, mesh=None):
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
        fast = build_fast_apply(self.model, self.variables,
                                jnp.bfloat16 if half_precision else None)
        if fast is not None:
            self._apply_fn, self.variables = fast
        else:
            self._apply_fn = lambda variables, *args: self.model.apply(
                variables, *args, train=False)
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
        )
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

    def _get_runner(self, with_prev: bool, quantize: bool):
        key = self._cache_key + (with_prev, quantize)
        if key not in _Engine._RUNNER_CACHE:
            forward, apply_fn, dtype = self._forward_with, self._apply_fn, self.dtype

            def run_all(variables, batches, prev_batches=None):
                if with_prev:
                    return jax.lax.map(
                        lambda ab: forward(apply_fn, dtype, ab[0], ab[1],
                                           quantize, variables),
                        (batches, prev_batches),
                    )
                return jax.lax.map(
                    lambda b: forward(apply_fn, dtype, b, None, quantize,
                                      variables), batches
                )

            self._cache_put(_Engine._RUNNER_CACHE, key, jax.jit(run_all))
        return _Engine._RUNNER_CACHE[key]

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

    def fused_predict_frames(self, imgs_u8: np.ndarray, xs, ys, resize_dim,
                             clip_threshold, invert: bool, progress=None):
        """The speed-of-light 2D predict: uint8 frames are uploaded in
        fixed-size chunks and one jitted program per chunk does per-frame
        percentile normalization, static-grid tiling (two XLA row/column
        gathers — no per-patch unrolling, so program size and compile count
        are O(1) in movie length), the batched U-Net forward (lax.map), uint8
        quantization and mean-overlap stitching — only the stitched uint8
        masks return to the host.  All chunks are dispatched asynchronously
        (upload of chunk k+1 overlaps compute of chunk k) and fetched once at
        the end.  Semantics match the host-staged path within one uint8
        quantization step (normalization in float32 instead of numpy
        float64)."""
        n_frames, h, w = imgs_u8.shape
        th, tw = resize_dim
        out_h, out_w = max(th, h), max(tw, w)
        xs = tuple(int(v) for v in xs)
        ys = tuple(int(v) for v in ys)
        n_chunk = min(self.FUSED_CHUNK_FRAMES, n_frames)
        # the fused path sizes its own forward batch: one lax.map step per
        # ~16M tile pixels (≈1 GB of level-1 activations in bf16) — measured
        # 2.2× faster than small batches on v5e (MXU fill), still far under
        # HBM.  The user's batch_size remains the floor for tiny workloads.
        per_chunk = len(xs) * len(ys) * n_chunk
        bs = max(self.batch_size, min(per_chunk, (1 << 24) // (th * tw)))
        key = self._cache_key + ("fused", n_chunk, h, w, th, tw, xs, ys,
                                 tuple(clip_threshold), invert, bs)
        if key not in _Engine._FUSED_CACHE:
            from ..ops.stitch import _stitch_xla
            forward, apply_fn, dt = self._forward_with, self._apply_fn, self.dtype
            nx, ny = len(xs), len(ys)
            per = nx * ny
            n = n_chunk * per
            n_pad = int(np.ceil(n / bs)) * bs
            # exact grid (linspace starts degenerate to stride-th/tw tiling,
            # the common case when the frame is a multiple of the tile): both
            # tiling and stitching are pure reshape/transposes — no gather,
            # no scatter accumulation
            exact = (xs == tuple(range(0, max(h, th), th))
                     and ys == tuple(range(0, max(w, tw), tw))
                     and max(h, th) == nx * th and max(w, tw) == ny * tw)
            # tile extraction as two axis gathers: rows then columns
            row_idx = (np.asarray(xs)[:, None] + np.arange(th)[None, :]).ravel()
            col_idx = (np.asarray(ys)[:, None] + np.arange(tw)[None, :]).ravel()

            def pipeline(variables, movie_u8):
                from ..ops.histogram import u8_clip_bounds

                # per-frame percentile clip + min-max → [0, 255]; exact
                # histogram percentiles — jnp.percentile would SORT 1M
                # pixels per frame, competing with the U-Net for device time
                lo, hi, fmin, fmax = (
                    v[:, None, None] for v in u8_clip_bounds(
                        movie_u8, clip_threshold[0], clip_threshold[1]))
                f = jnp.clip(movie_u8.astype(jnp.float32), lo, hi)
                f = jnp.where(fmax > fmin, (f - fmin) / (fmax - fmin) * 255.0, 0.0)
                if invert:
                    f = 255.0 - f
                if th > h:
                    f = jnp.pad(f, ((0, 0), (0, th - h), (0, 0)), mode="reflect")
                if tw > w:
                    f = jnp.pad(f, ((0, 0), (0, 0), (0, tw - w)), mode="reflect")
                u8 = f.astype(jnp.uint8)  # reference patch quantization
                if exact:
                    patches = (u8.reshape(n_chunk, nx, th, ny, tw)
                               .transpose(0, 1, 3, 2, 4)
                               .reshape(n, th, tw, 1))
                else:
                    rows = jnp.take(u8, jnp.asarray(row_idx), axis=1)
                    patches = jnp.take(rows, jnp.asarray(col_idx), axis=2)
                    patches = (patches.reshape(n_chunk, nx, th, ny, tw)
                               .transpose(0, 1, 3, 2, 4)
                               .reshape(n, th, tw, 1))
                if n_pad != n:
                    patches = jnp.concatenate(
                        [patches, jnp.broadcast_to(patches[-1:],
                                                   (n_pad - n,) + patches.shape[1:])])
                batches = patches.reshape((n_pad // bs, bs, th, tw, 1))
                probs = jax.lax.map(
                    lambda b: forward(apply_fn, dt, b, None, True, variables),
                    batches
                ).reshape((-1, th, tw, 1))[:n]

                if exact:  # inverse of the tiling transpose — no accumulation
                    return (probs.reshape(n_chunk, nx, ny, th, tw)
                            .transpose(0, 1, 3, 2, 4)
                            .reshape(n_chunk, nx * th, ny * tw, 1))[:, :h, :w]

                gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
                x_starts = jnp.asarray(gx.ravel().astype(np.int32))
                y_starts = jnp.asarray(gy.ravel().astype(np.int32))

                def stitch_one(frame_patches):
                    out, cnt = _stitch_xla(frame_patches.astype(jnp.float32),
                                           x_starts, y_starts, out_h, out_w)
                    return (out / jnp.maximum(cnt, 1.0)).astype(jnp.uint8)

                framed = probs.reshape((n_chunk, per, th, tw, 1))
                return jax.vmap(stitch_one)(framed)[:, :h, :w]

            self._cache_put(_Engine._FUSED_CACHE, key, jax.jit(pipeline))
        fn = _Engine._FUSED_CACHE[key]

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
            k_pad = int(np.ceil(k / n_chunk)) * n_chunk
            if k_pad != k and not isinstance(block, jax.Array):
                block = np.concatenate(
                    [block, np.broadcast_to(block[-1:], (k_pad - k, h, w))])
            elif k_pad != k:
                block = jnp.concatenate(
                    [block, jnp.broadcast_to(block[-1:], (k_pad - k, h, w))])
            dev = jnp.asarray(block)  # no-op for already-resident arrays
            for cstart in range(0, k, n_chunk):
                n_real = min(n_chunk, k - cstart)
                out = fn(self.variables, dev[cstart : cstart + n_chunk])
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
        n_pad = int(np.ceil(n / chunk)) * chunk if n > chunk else int(np.ceil(n / bs)) * bs
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
                 mesh=None, device=None, device_pipeline: bool = False,
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

        engine = _Engine(model_params, network, batch_size, half_precision, mesh=mesh)
        in_ch = engine.hyperparams.get("in_channels", 1)
        out_ch = engine.hyperparams.get("out_channels", 1)
        if in_ch != 1:
            raise ValueError("tiled 2D Predict supports single-channel input")

        if (device_pipeline and normalization_mode == "single" and out_ch == 1
                and mesh is None and imgs.dtype == np.uint8):
            # fully-fused path: normalize+tile+forward+stitch in ONE dispatch
            # (uint8 inputs only — float movies may carry NaNs and use the
            # host nanpercentile path)
            xs = grid_starts(self.imgs_shape[1], self.resize_dim[0], add_tile)
            ys = grid_starts(self.imgs_shape[2], self.resize_dim[1], add_tile)
            progress = progress_notifier if (show_progress and progress_notifier) else (
                ProgressNotifier.progress_notifier_tqdm() if show_progress else None
            )
            if show_progress:
                print("Predicting data ...")
            result = engine.fused_predict_frames(
                imgs, xs, ys, self.resize_dim, clip_threshold, invert,
                progress=progress,
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
    on-device per chunk.  Memory stays bounded by the chunk."""

    def __init__(self, tif_file, result_name, model_params, resize_dim=(512, 512),
                 invert=False, normalization_mode="single", clip_threshold=(0.0, 99.98),
                 add_tile=0, normalize_result=False, show_progress=True,
                 batch_size: int = 8, half_precision=False, mesh=None, device=None,
                 frames_per_chunk: int = 8,
                 progress_notifier: ProgressNotifier = None):
        del device
        self.invert = invert
        self.normalization_mode = normalization_mode
        self.clip_threshold = clip_threshold

        engine = _Engine(model_params, "Siam_UNet", batch_size, half_precision, mesh=mesh)

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

        if show_progress:
            print("Predicting data ...")
        it = range(0, n_frames, frames_per_chunk)
        if show_progress:
            notifier = progress_notifier or ProgressNotifier.progress_notifier_tqdm()
            it = notifier.iterator(it, total=int(np.ceil(n_frames / frames_per_chunk)))

        from ..ops.stitch import stitch_mean_frames_device

        last_page = None
        # the full output geometry is known upfront: pick BigTIFF when the
        # streamed uint8 masks will not fit classic-TIFF's 4 GiB offsets
        # (the reference's TiffWriter(bigtiff=False) just crashes there)
        out_bytes = n_frames * (int(frame_shape[0]) * int(frame_shape[1]) + 256)
        with tiff.TiffWriter(result_name,
                             bigtiff=out_bytes > 0xFFFFFFFF - (1 << 20)) as writer:
            for start in it:
                stop = min(start + frames_per_chunk, n_frames)
                k = stop - start
                patches = np.empty((k * per,) + self.resize_dim, dtype=np.uint8)
                prev_patches = np.empty_like(patches)
                for j, i in enumerate(range(start, stop)):
                    # each page is decoded once: the previous iteration's
                    # current frame is reused as this frame's prev
                    current = reader.read_page(i)
                    if i == 0:
                        prev = (current if n_frames == 1
                                else reader.read_page(1))
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
    mean-overlap stitching."""

    def __init__(self, vol, result_name, model_params, network="UNet3D",
                 resize_dim=(64, 128, 128), invert=False, clip_threshold=(0.0, 99.8),
                 add_patch=0, normalize_result=False, show_progress=True,
                 batch_size: int = 4, half_precision=False, mesh=None, device=None,
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(vol, (str, os.PathLike)):
            vol = tiff.imread(vol)
        vol = np.asarray(vol, dtype=np.float32)
        self.vol_shape = vol.shape
        self.resize_dim = tuple(resize_dim)

        # whole-volume normalization only (unet3d/predict.py:109-117)
        vol = _normalize_stack(vol[None], "all", clip_threshold, invert)[0]

        engine = _Engine(model_params, network, batch_size, half_precision, mesh=mesh)

        zs = grid_starts(self.vol_shape[0], self.resize_dim[0], 0)
        xs = grid_starts(self.vol_shape[1], self.resize_dim[1], add_patch)
        ys = grid_starts(self.vol_shape[2], self.resize_dim[2], add_patch)
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
        if show_progress:
            print("Predicting data ...")
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


def _round_to_16(v: int) -> int:
    return ((v + 15) // 16) * 16


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
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(imgs, (str, os.PathLike)):
            imgs = tiff.imread(imgs)
        imgs = np.asarray(imgs, dtype=np.float32)
        squeeze = imgs.ndim == 2
        if squeeze:
            imgs = imgs[None]
        self.imgs_shape = imgs.shape

        imgs = _normalize_stack(imgs, normalization_mode, clip_threshold, scale=1.0)

        engine = _Engine(model_params, network, batch_size, half_precision, mesh=mesh)
        heads = engine.hyperparams["output_heads"]
        self.target_keys = list(heads)

        # /16-rounded patch size (multi_output_unet/predict.py:153-162)
        ph = _round_to_16(min(self.imgs_shape[1], max_patch_size[0]))
        pw = _round_to_16(min(self.imgs_shape[2], max_patch_size[1]))
        self.patch_size = (ph, pw)
        pad_x = max(ph - self.imgs_shape[1], 0)
        pad_y = max(pw - self.imgs_shape[2], 0)
        imgs = np.pad(imgs, ((0, 0), (0, pad_x), (0, pad_y)), "reflect")
        xs = grid_starts(imgs.shape[1], ph, add_tile)
        ys = grid_starts(imgs.shape[2], pw, add_tile)

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
        if show_progress:
            print("Predicting data ...")
        preds = engine.predict_patches(patches[..., None], progress=progress,
                                       return_device=True)

        # safe-margin stitch ON DEVICE, frames fused into one dispatch per head
        from ..ops.stitch import stitch_weighted_frames_device
        from .tiling import _margin_weights

        out_h = max(ph, self.imgs_shape[1])
        out_w = max(pw, self.imgs_shape[2])
        self.result = {}
        for key in self.target_keys:
            weights = _margin_weights((len(xs), len(ys)), (ph, pw), safe_margin)
            stacked = stitch_weighted_frames_device(
                preds[key], weights, (xs, ys), self.imgs_shape[0],
                (out_h, out_w), fill_mean=True,
            )
            r = np.asarray(stacked)[:, : self.imgs_shape[1], : self.imgs_shape[2]]
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
                 progress_notifier: ProgressNotifier = None):
        del device
        if isinstance(imgs, (str, os.PathLike)):
            imgs = tiff.imread(imgs)
        imgs = np.asarray(imgs, dtype=np.float32)
        if imgs.ndim == 3:
            imgs = imgs[None]  # (n_volumes, Z, X, Y)
        self.imgs_shape = imgs.shape

        for v in range(imgs.shape[0]):
            imgs[v] = _normalize_stack(imgs[v][None], normalization_mode,
                                       clip_threshold, scale=1.0)[0]

        engine = _Engine(model_params, network, batch_size, half_precision, mesh=mesh)
        heads = engine.hyperparams["output_heads"]
        self.target_keys = list(heads)

        n_vol, d, h, w = imgs.shape
        tile = tuple(min(s, m) for s, m in zip((d, h, w), max_patch_size))
        self.patch_size = tile
        zs = overlap_starts(d, tile[0], overlap_factor)
        xs = overlap_starts(h, tile[1], overlap_factor)
        ys = overlap_starts(w, tile[2], overlap_factor)

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
        if show_progress:
            print("Predicting data ...")
        preds = engine.predict_patches(patches, progress=progress,
                                       return_device=True)

        # linear-blend stitch ON DEVICE, volumes fused into one dispatch per head
        from ..ops.stitch import stitch_weighted_frames_device
        from .tiling import _blend_weights

        self.result = {}
        for key in self.target_keys:
            weights = _blend_weights((len(zs), len(xs), len(ys)), tile, blend_margin)
            stacked = stitch_weighted_frames_device(
                preds[key], weights, (zs, xs, ys), n_vol, (d, h, w),
                fill_mean=False,
            )
            r = np.asarray(stacked)
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
