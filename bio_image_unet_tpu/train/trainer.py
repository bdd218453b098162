"""The generic Trainer (TPU-native rebuild of the reference's five Trainers).

Reference feature parity map:
- kwargs contract & epoch loop      ≙ unet/train.py:58-198
- siamese (image, prev_image) path  ≙ siam_unet/train.py:104-110
- temporal-consistency loss         ≙ unet3d/train.py:105,142-145
- output_heads / deep supervision / grad-clip / TensorBoard / val imaging
                                    ≙ multi_output_unet/train.py:18-407
- epoch_start resume                ≙ multi_output_unet/train.py:93-98

TPU-native design (no reference counterpart):
- the whole step (forward, loss, backward, Adam update, BatchNorm stat
  update) is one jitted function with donated buffers;
- batches are sharded over the mesh's ``data`` axis; XLA inserts the psum
  gradient reduction over ICI (SURVEY.md §2.8);
- ReduceLROnPlateau runs host-side between epochs and feeds the jitted step
  through ``optax.inject_hyperparams`` (patience/factor match torch's
  scheduler: unet/train.py:103);
- checkpoints are the self-describing native format (checkpoint.py) with the
  reference's hyperparam key schema, and the optimizer state actually
  restores on resume (the reference saves but never restores it,
  unet/train.py:107,119-121).

Divergences from reference quirks (SURVEY.md §7.4), implemented sanely:
- per-channel loss weights index the channel axis (the reference indexes the
  batch axis, unet/train.py:133-134);
- validation loss averages over all val batches (the reference appends only
  the last batch's loss, unet/train.py:142-153);
- multi-output validation does not re-apply head activations on top of the
  model's in-forward activations (multi_output_unet/train.py:218-224).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import checkpoint
from ..data.pipelines import DataLoader, random_split
from ..losses import get_head_loss, get_loss, smooth_l1_loss
from ..models import MODEL_REGISTRY, get_model
from ..parallel import data_sharding, get_mesh, replicated


def _init_on_cpu(model, rng, *args):
    """Run flax init on the host CPU backend: initialization is a one-shot
    program whose accelerator compile can cost minutes on a tunneled TPU
    (measured ~95s for the 32-filter U-Net) vs ~1s on CPU; the parameters
    are transferred to the mesh right afterwards anyway.  The persistent
    compile cache is bypassed here — CPU AOT entries are host-feature
    specific and this fleet's hosts are heterogeneous (SIGILL risk)."""
    from ..utils.utils import no_compilation_cache

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return model.init(rng, *args)
    with no_compilation_cache(), jax.default_device(cpu):
        return model.init(rng, *args)


def _model_name(model) -> str:
    for name, cls in MODEL_REGISTRY.items():
        if type(model) is cls:
            return name
    return type(model).__name__


class ReduceLROnPlateau:
    """torch optim.lr_scheduler.ReduceLROnPlateau(mode='min') semantics
    (reference unet/train.py:103: patience 4, factor 0.1;
    multi_output_unet/train.py:71: patience 5, factor 0.2), including torch's
    ``threshold``/``threshold_mode``: an epoch only counts as an improvement
    when the metric beats the best by a relative 1e-4 (default) — without it
    any infinitesimal improvement resets patience and the schedule diverges
    from torch's on plateaus."""

    def __init__(self, factor=0.1, patience=4, min_lr=0.0,
                 threshold=1e-4, threshold_mode="rel"):
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"threshold_mode {threshold_mode!r} not in ('rel', 'abs')")
        self.factor, self.patience, self.min_lr = factor, patience, min_lr
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def _is_better(self, metric: float) -> bool:
        if self.best == float("inf"):
            return True
        if self.threshold_mode == "rel":
            return metric < self.best * (1.0 - self.threshold)
        return metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.num_bad = 0
        return self.scale


class Trainer:
    """Generic trainer: ``Trainer(dataset, num_epochs, ...).start()``.

    The facade subpackages (``bio_image_unet_tpu.unet`` etc.) re-export this
    with their reference defaults pre-bound.
    """

    def __init__(
        self,
        dataset,
        num_epochs: int,
        network: Union[str, type] = "Unet",
        batch_size: int = 4,
        lr: float = 1e-3,
        in_channels: int = 1,
        out_channels: int = 1,
        channel_weights: Optional[Sequence[float]] = None,
        n_filter: int = 64,
        dilation: Union[int, bool, Tuple[int, ...]] = 1,
        val_split: float = 0.2,
        save_dir: str = "./",
        save_name: str = "model.ckpt",
        save_iter: bool = False,
        load_weights: Union[bool, str, None] = False,
        loss_function: str = "BCEDice",
        loss_params: Tuple[float, float] = (0.5, 0.5),
        # family-specific options
        mode: Optional[str] = None,  # siamese join mode
        use_interpolation: bool = False,  # 3D decoder
        time_loss_weight: Optional[float] = None,  # unet3d temporal term
        output_heads: Optional[Dict[str, dict]] = None,
        deep_supervision: bool = False,
        levels: int = 4,
        grad_clip: Optional[float] = None,
        # schedule / runtime
        scheduler_patience: int = 4,
        scheduler_factor: float = 0.1,
        mesh=None,
        seed: int = 0,
        half_precision: bool = False,
        remat: bool = False,
        device_cache: Union[bool, str] = False,  # True/"replicated" | "sharded"
        device_augment: bool = False,
        tensorboard: bool = False,
        log_images: bool = False,
        profile_dir: Optional[str] = None,
        device=None,  # accepted for reference API compatibility; unused
    ):
        del device
        # persistent compile cache on TPU only (CPU AOT entries are
        # host-feature-specific — see predict.predictor._maybe_enable_compile_cache)
        if not os.environ.get("BIU_TPU_NO_CACHE"):
            try:
                if jax.default_backend() == "tpu":
                    from ..utils.utils import enable_compilation_cache

                    enable_compilation_cache()
            except Exception:
                pass
        self.data = dataset
        self.num_epochs = num_epochs
        self.batch_size = batch_size
        self.lr = lr
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.n_filter = n_filter
        self.dilation = dilation
        self.loss_function = loss_function
        self.loss_params = tuple(loss_params)
        self.mode = mode
        self.time_loss_weight = time_loss_weight
        self.output_heads = output_heads
        self.deep_supervision = deep_supervision
        self.levels = levels  # reconciled with the model's actual depth below
        self.save_dir = save_dir
        self.save_name = save_name
        self.save_iter = save_iter
        self.device_augment = device_augment
        self.device_cache = device_cache
        self.remat = remat
        self.log_images = log_images
        self.profile_dir = profile_dir
        self.best_loss = float("inf")
        os.makedirs(save_dir, exist_ok=True)

        # --- model ---
        self.network = network
        self.model = get_model(
            network, n_filter=n_filter, in_channels=in_channels,
            out_channels=out_channels, dilation=dilation, mode=mode,
            use_interpolation=use_interpolation, output_heads=output_heads,
            deep_supervision=deep_supervision,
            dtype=jnp.bfloat16 if half_precision else None,
        )
        self.multi_output = output_heads is not None or bool(
            getattr(self.model, "heads", None)
        )
        # deep-supervision weights must match the model's actual grid depth
        # (MultiOutputNestedUNet_3Levels emits name_1..name_3 regardless of
        # the trainer kwarg) — derive from the model when it knows better
        self.levels = getattr(self.model, "levels", self.levels)
        if self.multi_output and self.output_heads is None:
            # default single sigmoid/BCEDice head (≙ the model-side default,
            # multi_output_unet/multi_output_unet.py:26-29)
            self.output_heads = {
                name: {"loss": "BCEDiceLoss", **dict(cfg)}
                for name, cfg in self.model.heads.items()
            }

        if channel_weights is None:
            self.channel_weights = np.ones(out_channels, dtype=np.float32)
        else:
            self.channel_weights = np.asarray(channel_weights, dtype=np.float32)

        # --- losses ---
        if self.multi_output:
            # the 3D multi-output reference parameterizes 'BCEDiceLoss'/
            # 'DiceLoss' differently from the 2D family
            # (multi_output_unet3d/train.py:150-153) — pick by model family
            from ..models.unet3d import MultiOutputUnet3D as _MO3D

            head_family = "3d" if isinstance(self.model, _MO3D) else "2d"
            self.head_losses = {
                name: get_head_loss(cfg["loss"], family=head_family)
                for name, cfg in self.output_heads.items()
            }
            self.head_weights = {
                name: cfg.get("weight", 1.0) for name, cfg in self.output_heads.items()
            }
            self.criterion = None
        else:
            self.criterion = get_loss(loss_function, **self._loss_kwargs())

        # --- data ---
        self.dim = getattr(dataset, "dim_out", None)
        train_data, val_data = random_split(dataset, val_split, seed=seed)
        self.train_loader = DataLoader(train_data, batch_size, shuffle=True,
                                       drop_last=True, seed=seed)
        # divergence: the reference also drops the last val batch
        # (unet/train.py:93), silently skipping validation entirely when
        # len(val) < batch_size; we evaluate every val sample
        self.val_loader = DataLoader(val_data, batch_size, shuffle=False, drop_last=False)

        # --- mesh & sharding ---
        if mesh is None:
            # largest data-parallel axis ≤ device count that divides the
            # batch: batch 12 on an 8-chip host trains on 6 chips, not 1
            n_dev = jax.device_count()
            n_data = max(d for d in range(1, min(n_dev, batch_size) + 1)
                         if batch_size % d == 0)
            mesh = get_mesh(n_data=n_data, n_spatial=1,
                            devices=jax.devices()[:n_data])
        self.mesh = mesh
        if batch_size % self.mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the mesh data "
                f"axis ({self.mesh.shape['data']})"
            )

        # --- optimizer (Adam ≙ unet/train.py:102; grad clip ≙
        # multi_output_unet/train.py:186) ---
        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                *( [optax.clip_by_global_norm(grad_clip)] if grad_clip is not None else [] ),
                optax.adam(learning_rate),
            )
        )(learning_rate=lr)
        self.scheduler = ReduceLROnPlateau(scheduler_factor, scheduler_patience)

        # --- init / resume ---
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(rng)
        sample = dataset[0]
        self.sample_keys = list(sample.keys())
        self.input_key = "volume" if "volume" in sample else "image"
        init_args = [jnp.zeros((1,) + sample[self.input_key].shape)]
        if self.mode is not None:
            init_args.append(jnp.zeros((1,) + sample["prev_image"].shape))
        variables = _init_on_cpu(self.model, init_rng, *init_args)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self.epoch_start = 0

        if load_weights:
            path = load_weights if isinstance(load_weights, str) else os.path.join(
                save_dir, save_name
            )
            state = checkpoint.load(path, opt_state_template=self.opt_state)
            self.params = state["variables"]["params"]
            self.batch_stats = state["variables"].get("batch_stats", {})
            if state.get("opt_state") is not None:
                self.opt_state = state["opt_state"]
            if state.get("epoch") is not None:
                self.epoch_start = int(state["epoch"])
            if state.get("best_loss") is not None:
                self.best_loss = float(state["best_loss"])
            sched = state.get("hyperparams", {}).get("scheduler_state")
            if sched:  # keep the decayed LR decayed across the resume
                self.scheduler.best = float(sched["best"])
                self.scheduler.num_bad = int(sched["num_bad"])
                self.scheduler.scale = float(sched["scale"])

        # replicate across the mesh
        rep = replicated(self.mesh)
        self.params = jax.device_put(self.params, rep)
        self.batch_stats = jax.device_put(self.batch_stats, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)

        # --- self-describing checkpoint hyperparams (≙ unet/train.py:107-118) ---
        self.params_meta = {
            "model_name": _model_name(self.model),
            "lr": lr,
            "loss_function": loss_function,
            "loss_params": self.loss_params,
            "n_filter": n_filter,
            "dilation": dilation,
            "batch_size": batch_size,
            "in_channels": in_channels,
            "out_channels": out_channels,
        }
        for attr in ("aug_factor", "clip_threshold", "noise_lims", "noise_amp",
                     "brightness_contrast", "shiftscalerotate", "gauss_noise_lims",
                     "shot_noise_lims", "random_rotate"):
            if hasattr(dataset, attr):
                key = "augmentation" if attr == "aug_factor" else attr
                self.params_meta[key] = getattr(dataset, attr)
        if mode is not None:
            self.params_meta["mode"] = mode
        if time_loss_weight is not None:
            self.params_meta["time_loss_weight"] = time_loss_weight
        # always self-describe the decoder style: Predict rebuilds the network
        # from these hyperparams and the 3D models default use_interpolation
        # differently (UNet3D False, MultiOutputUnet3D True)
        self.params_meta["use_interpolation"] = use_interpolation
        if self.multi_output:
            # the RESOLVED heads, not the ctor arg: with output_heads=None
            # the model's default head dict fills in, and PredictMultiOutput
            # rebuilds its target keys from this checkpoint field
            self.params_meta["output_heads"] = self.output_heads
            self.params_meta["deep_supervision"] = deep_supervision

        # --- observability ---
        self.writer = None
        if tensorboard:
            # own event writer (utils/tboard.py) — the reference rides
            # torch's SummaryWriter (multi_output_unet/train.py:100-101);
            # this rebuild logs the same scalars/images torch-free
            from ..utils.tboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=os.path.join(save_dir, "logs"))
        self.metrics_path = os.path.join(save_dir, "metrics.csv")
        # a resume (load_weights) APPENDS to the metric history — truncating
        # here erased every prior epoch's row, defeating the state the
        # trainer carefully restores (round-4 review finding)
        if not load_weights or not os.path.exists(self.metrics_path):
            with open(self.metrics_path, "w", newline="") as fh:
                csv.writer(fh).writerow(["epoch", "train_loss", "val_loss", "lr", "seconds"])

        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval_step = jax.jit(self._eval_step)

        # --- device-resident dataset + fused epoch scan ---
        # The TPU-idiomatic train loop: the tile dataset lives in HBM once,
        # every epoch is ONE jitted lax.scan over shuffled index rows — no
        # per-step host→device copies and no per-step dispatch latency
        # (~40 ms/step on tunneled TPUs).  Two multi-chip layouts:
        #
        # device_cache=True / "replicated": the dataset is replicated across
        #   the data axis while each scan row's index vector is sharded over
        #   ``data`` — every device gathers its batch slice locally, XLA
        #   inserts the psum gradient/BN reductions, and the shuffle is
        #   GLOBAL (loss trajectory identical to single-chip).
        # device_cache="sharded": the dataset itself is sharded over ``data``
        #   (cacheable size scales with chip count) and the epoch runs under
        #   shard_map — each device shuffles and samples its OWN shard
        #   (torch DistributedSampler semantics) with explicit pmean of
        #   grads/loss and of the BatchNorm running stats (non-sync per-chip
        #   BN, the DDP default).
        self._device_data = None
        self._cache_mode = (
            "sharded" if device_cache == "sharded"
            else ("replicated" if device_cache else None)
        )
        if self._cache_mode is not None:
            self._train_rng = np.random.default_rng(seed + 1)
            samples = [train_data[i] for i in range(len(train_data))]
            self._n_train = len(samples)
            n_data = self.mesh.shape["data"]
            if self._cache_mode == "sharded":
                # pad (wrap-around) so every shard holds the same count
                n_pad = int(np.ceil(len(samples) / n_data)) * n_data
                samples = samples + samples[: n_pad - len(samples)]
                self._n_local = n_pad // n_data
                put = lambda a: jax.device_put(a, data_sharding(self.mesh, a.ndim))
                self._jit_epoch = jax.jit(self._epoch_scan_sharded,
                                          donate_argnums=(0,))
            else:
                put = lambda a: jax.device_put(a, replicated(self.mesh))
                self._jit_epoch = jax.jit(self._epoch_scan, donate_argnums=(0,))
            self._device_data = {
                k: put(np.stack([s_[k] for s_ in samples])) for k in samples[0]
            }

    def _loss_kwargs(self):
        if self.loss_function in ("BCEDice",):
            return {"alpha": self.loss_params[0], "beta": self.loss_params[1]}
        if self.loss_function in ("Tversky", "logcoshTversky"):
            return {"alpha": self.loss_params[0], "beta": self.loss_params[1]}
        if self.loss_function == "weightedBCE":
            return {"alpha": self.loss_params[0], "beta": self.loss_params[1]}
        return {}

    # ------------------------------------------------------------------
    # loss computation (shared by train/eval)
    # ------------------------------------------------------------------

    def _model_inputs(self, batch):
        if self.mode is not None:
            return (batch[self.input_key], batch["prev_image"])
        return (batch[self.input_key],)

    def _compute_loss(self, outputs, batch, train: bool):
        if self.multi_output:
            total = 0.0
            if self.deep_supervision and train:
                if self.levels == 3:
                    sup_w = [0.5, 0.75, 1.0]
                elif self.levels == 4:
                    sup_w = [0.5, 0.75, 0.875, 1.0]
                else:
                    raise ValueError(
                        f"N = {self.levels} levels not valid. Choose N=3 or N=4."
                    )
                for name in self.output_heads:
                    target = batch[name]
                    for level, w in enumerate(sup_w, 1):
                        pred = outputs[f"{name}_{level}"]
                        total += w * self.head_weights[name] * self.head_losses[name](pred, target)
            else:
                for name in self.output_heads:
                    total += self.head_weights[name] * self.head_losses[name](
                        outputs[name], batch[name]
                    )
            return total

        _, logits = outputs
        target = batch["mask"]
        w = jnp.asarray(self.channel_weights)
        per_ch = [
            self.criterion(logits[..., ch], target[..., ch])
            for ch in range(self.out_channels)
        ]
        loss = sum(p * w[j] for j, p in enumerate(per_ch)) / jnp.sum(w)
        if self.time_loss_weight is not None and logits.shape[0] > 1:
            # SmoothL1 between batch-adjacent logits (unet3d/train.py:142-145);
            # skipped for single-sample batches (mean over an empty slice is
            # NaN — the reference crashes the same way on batch 1)
            loss = loss + self.time_loss_weight * smooth_l1_loss(logits[1:], logits[:-1])
        return loss

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def _train_step(self, carry, batch, rng, pmean_axis=None):
        params, batch_stats, opt_state = carry
        rng, aug_rng = jax.random.split(rng)
        if self.device_augment:
            # fresh on-device augmentation draw per step (augment_jax.py) —
            # replaces the reference's aug_factor disk copies
            from ..data.augment_jax import augment_batch, augment_batch_heads

            if self.multi_output:
                img, tgts = augment_batch_heads(
                    aug_rng, batch[self.input_key],
                    {k: batch[k] for k in self.output_heads},
                    orientation_keys=tuple(
                        k for k in self.output_heads if "orientation" in k
                    ),
                )
                batch = {**batch, self.input_key: img, **tgts}
            elif self.mode is not None:
                img, mask, prev = augment_batch(
                    aug_rng, batch[self.input_key], batch["mask"],
                    batch["prev_image"],
                )
                batch = {**batch, self.input_key: img, "mask": mask,
                         "prev_image": prev}
            else:
                img, mask = augment_batch(aug_rng, batch[self.input_key],
                                          batch["mask"])
                batch = {**batch, self.input_key: img, "mask": mask}

        def forward(p, step_rng, *inputs):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return self.model.apply(
                variables, *inputs, train=True,
                mutable=["batch_stats"], rngs={"dropout": step_rng},
            )

        if self.remat:
            # gradient checkpointing: drop forward activations and
            # rematerialize them in the backward pass — ~2× less HBM for
            # activations at ~1.3× step FLOPs; lets batch or tile size grow
            forward = jax.checkpoint(forward)

        def loss_fn(p):
            outputs, mutated = forward(p, rng, *self._model_inputs(batch))
            return self._compute_loss(outputs, batch, train=True), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_stats = mutated.get("batch_stats", batch_stats)
        if pmean_axis is not None:
            # explicit collectives (shard_map path): average grads/loss over
            # the data axis; BN running stats are pmean'd too (non-sync
            # per-chip BN ≙ torch DDP default, then kept consistent)
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            new_stats = jax.lax.pmean(new_stats, pmean_axis)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state), loss

    def _eval_step(self, params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outputs = self.model.apply(variables, *self._model_inputs(batch), train=False)
        return self._compute_loss(outputs, batch, train=False), outputs

    def _shard(self, batch):
        n_data = self.mesh.shape["data"]
        sharded = {}
        for k, v in batch.items():
            if v.shape[0] % n_data == 0:
                sharded[k] = jax.device_put(v, data_sharding(self.mesh, v.ndim))
            else:  # remainder val batch: replicate rather than shard
                sharded[k] = jax.device_put(v, replicated(self.mesh))
        return sharded

    # ------------------------------------------------------------------
    # epoch loop
    # ------------------------------------------------------------------

    def _epoch_scan(self, carry, data, idx_matrix, rng):
        """One fused epoch: lax.scan over (n_steps, batch) index rows with
        on-device gathers from the HBM-resident dataset."""
        n_steps = idx_matrix.shape[0]
        rngs = jax.random.split(rng, n_steps)

        def body(c, inp):
            idx, step_rng = inp
            batch = {k: v[idx] for k, v in data.items()}
            c, loss = self._train_step(c, batch, step_rng)
            return c, loss

        return jax.lax.scan(body, carry, (idx_matrix, rngs))

    def _epoch_scan_sharded(self, carry, data, idx_matrix, rng):
        """Fused epoch over a dataset SHARDED across the ``data`` axis:
        shard_map runs the scan per device on its local shard with LOCAL
        indices (``idx_matrix``'s batch axis is sharded), grads/loss/BN
        stats pmean over ``data`` inside the step."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def per_device(c, data_shard, idx_local, epoch_rng):
            # decorrelate the per-device streams: the epoch rng arrives
            # replicated (P()), so without the axis_index fold every shard
            # would draw IDENTICAL augmentation/dropout randomness and
            # cross-device diversity would be batch/n_data, not batch
            epoch_rng = jax.random.fold_in(epoch_rng,
                                           jax.lax.axis_index("data"))
            n_steps = idx_local.shape[0]
            rngs = jax.random.split(epoch_rng, n_steps)

            def body(c, inp):
                idx, step_rng = inp
                batch = {k: v[idx] for k, v in data_shard.items()}
                return self._train_step(c, batch, step_rng, pmean_axis="data")

            return jax.lax.scan(body, c, (idx_local, rngs))

        return shard_map(
            per_device,
            mesh=self.mesh,
            in_specs=(P(), P("data"), P(None, "data"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(carry, data, idx_matrix, rng)

    def _iterate_train_fused(self, epoch):
        print(f"\nStarting training epoch {epoch} (fused on-device) ...")
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        if self._cache_mode == "sharded":
            # per-shard local shuffle (DistributedSampler semantics): each
            # device's column block holds LOCAL indices into its own shard
            local_bs = self.batch_size // n_data
            n_steps = self._n_local // local_bs
            if n_steps == 0:
                return float("nan")
            cols = []
            for _ in range(n_data):
                perm = self._train_rng.permutation(self._n_local)
                cols.append(perm[: n_steps * local_bs]
                            .reshape(n_steps, local_bs))
            idx_matrix = np.concatenate(cols, axis=1).astype(np.int32)
        else:
            n_steps = self._n_train // self.batch_size
            if n_steps == 0:
                return float("nan")
            perm = self._train_rng.permutation(self._n_train)[
                : n_steps * self.batch_size]
            idx_matrix = perm.reshape(n_steps, self.batch_size).astype(np.int32)
        # shard each step's index row over the data axis: the on-device
        # gather (and everything downstream) then runs batch-parallel
        idx_dev = jax.device_put(idx_matrix,
                                 NamedSharding(self.mesh, P(None, "data")))
        carry = (self.params, self.batch_stats, self.opt_state)
        self.rng, epoch_rng = jax.random.split(self.rng)
        # donate_argnums invalidates the epoch-start buffers once the
        # dispatch enqueues; rebind in a finally so an interrupt between the
        # (async) call returning and the assignment still leaves self.params
        # pointing at live buffers for the emergency checkpoint.  (Tracing/
        # compile happens BEFORE donation, so interrupts there are safe too.)
        out = None
        try:
            out = self._jit_epoch(carry, self._device_data, idx_dev, epoch_rng)
        finally:
            if out is not None:
                self.params, self.batch_stats, self.opt_state = out[0]
        return float(jnp.mean(out[1]))

    def _iterate_train(self, epoch):
        if self._device_data is not None:
            return self._iterate_train_fused(epoch)
        print(f"\nStarting training epoch {epoch} ...")
        losses = []
        carry = (self.params, self.batch_stats, self.opt_state)
        try:
            for batch in self.train_loader:
                self.rng, step_rng = jax.random.split(self.rng)
                carry, loss = self._jit_train_step(carry, self._shard(batch), step_rng)
                losses.append(loss)  # device scalar — no per-step host sync:
                # steps stay queued on the accelerator and overlap the host
                # loader; the single jax.device_get below syncs once per epoch
        finally:
            # donate_argnums invalidated the PRE-epoch buffers on the first
            # step; rebind to the freshest completed-step state even on
            # KeyboardInterrupt so the emergency checkpoint can be written
            self.params, self.batch_stats, self.opt_state = carry
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    def _iterate_val(self, epoch):
        print(f"\nStarting validation epoch {epoch} ...")
        losses = []
        last = None
        for batch in self.val_loader:
            loss, outputs = self._jit_eval_step(self.params, self.batch_stats,
                                                self._shard(batch))
            losses.append(loss)  # device scalar — defer the host sync so val
            # batches stay queued on the accelerator like the train loop
            last = (batch, outputs)
        val_loss = float(np.mean(jax.device_get(losses))) if losses else float("nan")
        if self.log_images and last is not None:
            self._plot_validation(epoch, *last)
        return val_loss

    def _plot_validation(self, epoch, batch, outputs):
        """Per-epoch validation image grids
        (≙ multi_output_unet/train.py:234-318 plot_images)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover
            return
        out_dir = os.path.join(self.save_dir, "val_results")
        os.makedirs(out_dir, exist_ok=True)
        x = np.asarray(batch[self.input_key][0])
        x2d = x[x.shape[0] // 2] if x.ndim == 4 else x  # middle slice for 3D
        if self.multi_output:
            names = list(self.output_heads)
            preds = {k: np.asarray(outputs[k][0]) for k in names}
        else:
            names = ["mask"]
            preds = {"mask": np.asarray(outputs[0][0])}
        fig, axes = plt.subplots(2, len(names) + 1, figsize=(3 * (len(names) + 1), 6))
        axes = np.atleast_2d(axes)
        for row in range(2):
            axes[row, 0].imshow(x2d[..., 0], cmap="gray")
            axes[row, 0].set_title("Input" if row == 0 else "")
            axes[row, 0].axis("off")
        for i, name in enumerate(names):
            p = preds[name]
            t = np.asarray(batch[name][0])
            p2d = p[p.shape[0] // 2] if p.ndim == 4 else p
            t2d = t[t.shape[0] // 2] if t.ndim == 4 else t
            axes[0, i + 1].imshow(p2d[..., 0], cmap="viridis")
            axes[0, i + 1].set_title(f"{name} (Pred)")
            axes[0, i + 1].axis("off")
            axes[1, i + 1].imshow(t2d[..., 0], cmap="viridis")
            axes[1, i + 1].set_title(f"{name} (True)")
            axes[1, i + 1].axis("off")
        fig.savefig(os.path.join(out_dir, f"epoch_{epoch}.png"), dpi=120)
        plt.close(fig)
        if self.writer is not None:
            img = np.asarray(
                preds[names[0]][..., 0]
                if preds[names[0]].ndim == 3
                else preds[names[0]][preds[names[0]].shape[0] // 2][..., 0]
            )
            self.writer.add_image(f"val/{names[0]}", img[None], epoch)

    def _save(self, path, epoch):
        variables = {"params": self.params}
        if self.batch_stats:
            variables["batch_stats"] = self.batch_stats
        meta = {
            **self.params_meta,
            # plateau-scheduler state: without it a resume silently resets
            # the learning rate to its undecayed value on the first epoch
            "scheduler_state": {"best": self.scheduler.best,
                                "num_bad": self.scheduler.num_bad,
                                "scale": self.scheduler.scale},
        }
        checkpoint.save(path, variables, meta, epoch=epoch,
                        best_loss=self.best_loss, opt_state=self.opt_state)

    def start(self, test_data_path=None, result_path=None, test_resize_dim=(512, 512)):
        """Run training; optionally predict a folder of test tifs after each
        epoch (≙ unet/train.py:159-197)."""
        save_path = os.path.join(self.save_dir, self.save_name)
        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
        try:
            self._run_epochs(save_path, test_data_path, result_path, test_resize_dim)
        except (KeyboardInterrupt, Exception):
            # failure recovery: the reference loses all mid-training progress
            # on a crash (SURVEY.md §5); we persist an emergency checkpoint
            # (atomic write) so training resumes from the last completed step
            emergency = os.path.join(self.save_dir, "model_interrupted.ckpt")
            try:
                # the epoch a resume should continue FROM (last completed)
                self._save(emergency, getattr(self, "_epoch_reached",
                                              self.epoch_start))
                print(f"\nInterrupted — state saved to {emergency}")
            except Exception as save_err:
                print(f"\nInterrupted — emergency checkpoint failed: {save_err}")
            raise
        finally:
            if self.profile_dir:
                jax.profiler.stop_trace()
            if self.writer is not None:
                self.writer.flush()
        return self.best_loss

    def _run_epochs(self, save_path, test_data_path, result_path, test_resize_dim):
        for epoch in range(self.epoch_start, self.epoch_start + self.num_epochs):
                t0 = time.time()
                train_loss = self._iterate_train(epoch)
                val_loss = self._iterate_val(epoch)
                if np.isnan(val_loss):
                    # no validation batches (val_split=0 or tiny dataset):
                    # fall back to the train loss for scheduling and
                    # checkpointing — the reference crashes on an empty val
                    # loader (unet/train.py:154 stacks an empty list)
                    val_loss = train_loss
                lr_scale = self.scheduler.step(val_loss)
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    self.lr * lr_scale, dtype=jnp.float32
                )
                dt = time.time() - t0
                print(f"\nEpoch {epoch} completed in {dt:.2f} seconds "
                      f"(train {train_loss:.5f}, val {val_loss:.5f})")

                with open(self.metrics_path, "a", newline="") as fh:
                    csv.writer(fh).writerow(
                        [epoch, train_loss, val_loss, self.lr * lr_scale, round(dt, 2)]
                    )
                if self.writer is not None:
                    self.writer.add_scalar("Loss/train", train_loss, epoch)
                    self.writer.add_scalar("Loss/val", val_loss, epoch)

                if val_loss < self.best_loss:
                    print(f"\nValidation loss improved from {self.best_loss:.5f} "
                          f"to {val_loss:.5f} - saving model state")
                    self.best_loss = val_loss
                    self._save(save_path, epoch)
                if self.save_iter:
                    self._save(os.path.join(self.save_dir, f"model_epoch_{epoch}.ckpt"),
                               epoch)

                self._epoch_reached = epoch + 1  # resume continues from here

                if test_data_path is not None:
                    self._predict_test_folder(epoch, test_data_path, result_path,
                                              test_resize_dim)

    def _predict_test_folder(self, epoch, test_data_path, result_path, resize_dim):
        import glob as _glob

        from ..predict import Predict

        print("\nPredicting test data...")
        ckpt = os.path.join(self.save_dir, f"model_epoch_{epoch}.ckpt")
        if not os.path.exists(ckpt):
            self._save(ckpt, epoch)
        os.makedirs(result_path, exist_ok=True)
        for file in _glob.glob(os.path.join(test_data_path, "*.tif")):
            from ..data import tiff

            img = tiff.imread(file)
            Predict(img,
                    os.path.join(result_path,
                                 os.path.basename(file) + f"epoch_{epoch}.tif"),
                    ckpt, resize_dim=resize_dim, show_progress=False)
