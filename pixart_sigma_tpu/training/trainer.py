"""The training driver: config -> data -> sharded steps -> checkpoints.

Spec: /root/reference/train_scripts/train.py (the main trainer, §3.1 of
SURVEY.md): per-step iDDPM loss, grad clip, CAME/AdamW, EMA, windowed metric
logging with ETA, periodic checkpointing behind a barrier, periodic
validation sampling, resume with dataloader fast-forward.

TPU-native: one jitted GSPMD program per aspect-ratio bucket shape; batches
device_put with the mesh batch sharding; checkpoints via orbax; the NaN
watchdog (utils.debug) replaces DebugUnderflowOverflow.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.config import Config
from pixart_sigma_tpu.data import (
    AspectRatioBatchSampler,
    BalancedAspectRatioBatchSampler,
    DataLoader,
    PixArtDataset,
    PixArtMSDataset,
    ShardedBatchSampler,
    aspect_ratio_table,
)
from pixart_sigma_tpu.diffusion import IDDPM
from pixart_sigma_tpu.models.builder import build_model_from_config
from pixart_sigma_tpu.parallel.mesh import MeshConfig, build_mesh, data_sharding
from pixart_sigma_tpu.training.lr_schedule import build_lr_schedule
from pixart_sigma_tpu.training.optim import auto_scale_lr, build_optimizer
from pixart_sigma_tpu.training.train_state import TrainState
from pixart_sigma_tpu.training.train_step import make_train_step
from pixart_sigma_tpu.utils import checkpoint as ckpt_io
from pixart_sigma_tpu.utils.debug import find_nonfinite, format_health_report
from pixart_sigma_tpu.utils.logging import (
    LogBuffer,
    MetricsWriter,
    Tracker,
    get_logger,
)


def build_dataset(config: Config):
    data_cfg = dict(config.data)
    dtype_name = data_cfg.pop("type", "PixArtDataset")
    data_cfg.pop("transform", None)
    root = os.path.join(config.get("data_root", ""), data_cfg.pop("root", ""))
    common = dict(
        resolution=config.image_size,
        max_length=config.model_max_length,
        real_prompt_ratio=config.get("real_prompt_ratio", 1.0),
        seed=config.get("seed", 0),
    )
    common.update(data_cfg)
    if config.get("multi_scale") and dtype_name in ("PixArtMSDataset", "InternalDataMS", "InternalDataMSSigma"):
        return PixArtMSDataset(
            root, aspect_ratio_type=config.aspect_ratio_type or config.image_size,
            **common,
        )
    return PixArtDataset(root, **common)


class Trainer:
    """config -> data -> sharded steps -> checkpoints.

    `vae`/`vae_params` and `t5` enable on-the-fly encoding when the dataset
    yields raw images/prompts (config load_vae_feat/load_t5_feat False —
    reference train.py:144-168); with precomputed features they stay None.
    """

    def __init__(
        self,
        config: Config,
        work_dir: Optional[str] = None,
        vae=None,
        vae_params=None,
        t5=None,
    ):
        self.vae = vae
        self.vae_params = vae_params
        self.t5 = t5
        self._encode_jit = None
        self.config = config
        self.work_dir = work_dir or config.work_dir
        os.makedirs(self.work_dir, exist_ok=True)
        # The writers below are all rank-aware internally (file handles on
        # process 0 only — reference diffusion/utils/logger.py:26-84); the
        # config dump is guarded here.
        if jax.process_index() == 0:
            config.dump(os.path.join(self.work_dir, "config.py.dump"))
        self.logger = get_logger(work_dir=self.work_dir)
        self.metrics = MetricsWriter(self.work_dir)
        tracker = Tracker(self.work_dir, config.get("report_to"))
        self.tracker = tracker if tracker.enabled else None

        mesh_cfg = config.get("mesh", {}) or {}
        self.mesh = build_mesh(MeshConfig(**mesh_cfg))
        self.logger.info(f"mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

        self.model = build_model_from_config(config)
        self.diffusion = IDDPM(
            timestep_respacing=[config.train_sampling_steps],
            learn_sigma=True,
            rescale_learned_sigmas=True,
            snr=config.get("snr_loss", False),
        )

        # LR with auto scaling (reference optimizer.py:18-28 + train.py:448).
        # The optimizer/schedule are built lazily once the true horizon is
        # known: reference train.py:469 sets
        # total_steps = len(train_dataloader) * num_epochs — we mirror that in
        # train(); a direct init_state() call falls back to a default horizon.
        opt_cfg = dict(config.optimizer)
        # effective global batch = per-process batch x process count (the
        # per-process batch is already sharded over that process's devices);
        # reference: train_batch_size(per-GPU) * world_size, optimizer.py:18-28
        world_batch = config.train_batch_size * jax.process_count()
        if config.get("auto_lr"):  # reference train.py:448: `if config.auto_lr`
            lr, self.lr_scale_ratio = auto_scale_lr(
                opt_cfg.pop("lr"), world_batch, rule=config.auto_lr["rule"]
            )
        else:
            lr, self.lr_scale_ratio = opt_cfg.pop("lr"), 1.0
        self._base_lr = lr
        self._opt_cfg = opt_cfg
        self.tx = None
        self.schedule = None
        self.state: Optional[TrainState] = None
        # optional importance sampling of t (component #12; off by default,
        # matching the reference trainer)
        self.sampler_state = None
        if config.get("schedule_sampler") == "loss-second-moment":
            from pixart_sigma_tpu.diffusion.timestep_sampler import (
                LossSecondMomentResampler,
            )

            self.sampler_state = LossSecondMomentResampler.create(
                config.train_sampling_steps
            )
        self.step_fn = make_train_step(
            self.model, self.diffusion, mesh=self.mesh,
            fsdp=config.get("use_fsdp", False),
            tensor=config.get("use_tensor_parallel", False),
            schedule_sampler=self.sampler_state,
            snr_gamma=config.get("snr_gamma", None),
            mask_loss_coef=config.get("mask_loss_coef", 0.0),
            fsdp_min_size=config.get("fsdp_min_size", 2**16),
        )
        self.batch_sharding = data_sharding(self.mesh)

    # ------------------------------------------------------------- optimizer
    def build_optimizer(self, total_steps: int) -> None:
        """Build the LR schedule + optimizer for a known training horizon.

        Reference train.py:469: total_steps = len(train_dataloader) *
        num_epochs feeds build_lr_scheduler so cosine/warmup schedules span
        the real run length.
        """
        cfg = self.config
        schedule = build_lr_schedule(
            cfg.lr_schedule, self._base_lr,
            num_training_steps=total_steps,
            lr_scale_ratio=self.lr_scale_ratio,
            **cfg.get("lr_schedule_args", {}),
        )
        opt_cfg = dict(self._opt_cfg)
        # config knob no_weight_decay_on: param-path substrings exempt from
        # weight decay (reference zero_weight_decay groups, optimizer.py:138)
        skip_fn = None
        no_decay = cfg.get("no_weight_decay_on")
        if no_decay:

            def skip_fn(path, p):
                joined = "/".join(str(x) for x in path)
                return any(s in joined for s in no_decay)

        tx = build_optimizer(
            name=opt_cfg.pop("type"),
            learning_rate=schedule,
            grad_clip_norm=cfg.get("gradient_clip"),
            skip_decay_fn=skip_fn,
            **opt_cfg,
        )
        accum = cfg.get("gradient_accumulation_steps", 1)
        if accum > 1:
            import optax

            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        self.schedule = schedule
        self.total_steps = total_steps

    def _ensure_optimizer(self, total_steps: Optional[int] = None) -> None:
        if self.tx is None:
            cfg = self.config
            if total_steps is None:
                spe = cfg.get("steps_per_epoch") or 10_000
                total_steps = spe * cfg.num_epochs
            self.build_optimizer(total_steps)

    # ---------------------------------------------------------------- state
    def init_state(self, rng: jax.Array, example_batch: Dict[str, Any]):
        cfg = self.config
        self._ensure_optimizer()
        B = example_batch["latents"].shape[0]
        init_kwargs = {}
        if self.model.cfg.micro_condition:
            init_kwargs = dict(
                img_hw=jnp.ones((B, 2)), aspect_ratio=jnp.ones((B, 1))
            )
        # init from SHAPES only, on host-local zeros: params depend on shapes
        # + the (process-identical) seed, never on batch values. Keeps init
        # out of multi-host op-by-op semantics — the jitted step's
        # in_shardings place the replicated params onto the global mesh.
        params = self.model.init(
            {"params": rng, "caption_drop": jax.random.fold_in(rng, 1)},
            jnp.zeros(example_batch["latents"].shape, jnp.float32),
            jnp.zeros((B,)),
            jnp.zeros(example_batch["y"].shape, jnp.float32),
            jnp.ones(example_batch["y_mask"].shape, jnp.int32),
            train=True,
            **init_kwargs,
        )["params"]
        if cfg.get("load_from"):
            self.logger.info(f"loading weights from {cfg.load_from}")
            params = ckpt_io.load_checkpoint(cfg.load_from, self.model.cfg)
        self.state = TrainState.create(
            params=params, tx=self.tx, ema=True, ema_rate=cfg.ema_rate,
            ema_warmup=cfg.get("ema_warmup", True),
        )
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        self.logger.info(f"model params: {n_params / 1e6:.1f} M")

    def maybe_resume(self) -> int:
        cfg_resume = self.config.get("resume_from") or {}
        path = cfg_resume.get("checkpoint")
        if path == "latest":
            path = ckpt_io.latest_checkpoint(os.path.join(self.work_dir, "checkpoints"))
        if not path:
            return 0
        self.logger.info(f"resuming from {path}")
        self.state = ckpt_io.restore_train_state(path, self.state)
        return int(self.state.step)

    # ----------------------------------------------------------------- data
    def build_loader(self, skip_batches: int = 0):
        cfg = self.config
        dataset = build_dataset(cfg)
        # Multi-host: config.train_batch_size is the PER-PROCESS batch;
        # every process builds the same (seeded) global-batch sequence at
        # batch_size * process_count and keeps its rank slice. Reference
        # equivalent: accelerate's per-rank data sharding
        # (train_scripts/train.py:310-326).
        n_proc = jax.process_count()
        global_bs = cfg.train_batch_size * n_proc
        if cfg.get("multi_scale"):
            table = aspect_ratio_table(cfg.aspect_ratio_type or cfg.image_size)
            # config knob balanced_sampler: per-bucket round-robin quotas
            # (reference BalancedAspectRatioBatchSampler, data_sampler.py:79;
            # imported-but-unwired in the reference's shipped trainers)
            cls = (
                BalancedAspectRatioBatchSampler
                if cfg.get("balanced_sampler")
                else AspectRatioBatchSampler
            )
            sampler = cls(
                dataset, global_bs, table,
                valid_num=cfg.get("valid_num", 0), seed=cfg.seed,
            )
        else:
            sampler = _SimpleBatchSampler(
                len(dataset), global_bs, seed=cfg.seed, dataset=dataset
            )
        if n_proc > 1:
            sampler = ShardedBatchSampler(
                sampler, cfg.train_batch_size, n_proc, jax.process_index()
            )
        # threads are the measured default (scripts/bench_loader.py, 256px
        # B=64 on this host): image mode ~86-101 img/s at 16 workers vs the
        # 82.5 img/s step rate, and the process pool is strictly SLOWER
        # (~30 img/s — IPC of decoded pixels dominates). loader_processes
        # stays available for hosts where item cost >> IPC cost.
        return DataLoader(
            dataset, sampler, num_workers=cfg.get("num_workers", 4),
            skip_batches=skip_batches,
            use_processes=cfg.get("loader_processes", False),
        )

    # ----------------------------------------------------------------- loop
    def _encode_images(self, images: np.ndarray, step: int = 0) -> jnp.ndarray:
        """On-the-fly VAE posterior sampling (reference train.py:144-155)."""
        assert self.vae is not None, (
            "dataset yields raw images (load_vae_feat=False) but the Trainer "
            "was built without a VAE — pass vae=/vae_params= or precompute"
        )
        from pixart_sigma_tpu.models.vae import AutoencoderKL

        if self._encode_jit is None:
            sample_posterior = self.config.get("sample_posterior", True)

            def enc(params, x, rng):
                mean, logvar = self.vae.apply(
                    params, x, method=AutoencoderKL.encode
                )
                if sample_posterior:
                    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                        rng, mean.shape, mean.dtype
                    )
                else:
                    z = mean
                return z

            self._encode_jit = jax.jit(enc)
        # Deterministic per-step key (reproducible + resume-stable); the
        # reference inherits determinism from torch's seeded global RNG.
        # Fold in the process index so multi-host posterior draws are iid
        # across ranks (each rank encodes a disjoint slice of the batch).
        rng = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), step)
        if jax.process_count() > 1:
            rng = jax.random.fold_in(rng, jax.process_index())
        return self._encode_jit(self.vae_params, jnp.asarray(images), rng)

    def prepare_batch(
        self, batch: Dict[str, Any], step: int = 0
    ) -> Dict[str, jnp.ndarray]:
        if "latents" not in batch:
            batch = dict(batch, latents=self._encode_images(batch["image"], step))
        if "y" not in batch:
            assert self.t5 is not None, (
                "dataset yields raw prompts (load_t5_feat=False) but the "
                "Trainer was built without a T5 encoder"
            )
            y, y_mask = self.t5.get_text_embeddings(batch["prompt"])
            batch = dict(batch, y=y, y_mask=y_mask)
        out = {
            "latents": jnp.asarray(batch["latents"]) * self.config.scale_factor,
            "y": batch["y"],
            "y_mask": batch["y_mask"],
        }
        if self.model.cfg.micro_condition:
            out["img_hw"] = batch["img_hw"]
            out["aspect_ratio"] = batch["aspect_ratio"]
        return {k: self._put_global(v) for k, v in out.items()}

    def _put_global(self, v) -> jax.Array:
        """Host-local batch slice -> global sharded array on the mesh.

        Single-process: a plain device_put with the batch sharding. Multi-
        process: each rank contributes its local rows; the global batch is
        the rank-ordered concatenation (matching ShardedBatchSampler's
        slicing), assembled with jax.make_array_from_process_local_data —
        the pattern the reference gets from accelerate's DDP data sharding.
        """
        arr = np.asarray(v)
        if jax.process_count() == 1:
            return jax.device_put(arr, self.batch_sharding)
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        return jax.make_array_from_process_local_data(
            self.batch_sharding, arr, global_shape
        )

    def train(self, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        start_step = 0
        loader = self.build_loader()
        steps_per_epoch = cfg.get("steps_per_epoch") or len(loader)
        self._ensure_optimizer(steps_per_epoch * cfg.num_epochs)
        buf = LogBuffer()
        t_last = time.time()

        if self.state is None:
            first = next(iter(loader))
            self.init_state(rng, self.prepare_batch(first))
            start_step = self.maybe_resume()

        # Resume fast-forward (reference train.py:141-143 + filename epoch
        # parse at :469-479): restart inside the epoch the checkpoint stopped
        # in, skipping the batches already consumed that epoch.
        start_epoch = start_step // steps_per_epoch
        if start_step:
            skip = start_step % steps_per_epoch
            loader.skip_batches = skip
            self.logger.info(
                f"resume fast-forward: epoch {start_epoch}, skipping {skip} batches"
            )

        step = start_step
        for epoch in range(start_epoch, cfg.num_epochs):
            # Distinct shuffle order per epoch (torch DistributedSampler
            # semantics; reference gets this for free from set_epoch).
            loader.batch_sampler.set_epoch(epoch)
            for batch in loader:
                batch_dev = self.prepare_batch(batch, step)
                if self.sampler_state is not None:
                    self.state, metrics, self.sampler_state = self.step_fn(
                        self.state, batch_dev, rng, self.sampler_state
                    )
                else:
                    self.state, metrics = self.step_fn(self.state, batch_dev, rng)
                step += 1
                buf.update({k: v for k, v in metrics.items()})
                if step % cfg.log_interval == 0:
                    buf.average()
                    dt = (time.time() - t_last) / cfg.log_interval
                    t_last = time.time()
                    lr_now = float(self.schedule(step))
                    msg = (
                        f"epoch {epoch} step {step}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in buf.output.items())
                        + f" lr={lr_now:.2e} {dt * 1000:.0f}ms/it"
                    )
                    self.logger.info(msg)
                    self.metrics.write(step, dict(buf.output, lr=lr_now))
                    if self.tracker is not None:
                        self.tracker.add_scalars(step, dict(buf.output, lr=lr_now))
                    if not np.isfinite(buf.output.get("loss", 0.0)):
                        # NaN watchdog (replaces DebugUnderflowOverflow)
                        self.logger.error("non-finite loss; param health:")
                        self.logger.error(format_health_report(self.state.params))
                        bad = find_nonfinite(self.state.params)
                        # localise the first overflowing module output in one
                        # captured re-run of the forward on this batch
                        # (the reference's forward-hook tracer, misc.py:107)
                        try:
                            from pixart_sigma_tpu.utils.debug import (
                                first_bad_module,
                                format_overflow_report,
                                scan_group_sizes_from_config,
                                trace_forward,
                            )

                            _, inter = trace_forward(
                                self.model, {"params": self.state.params},
                                batch_dev["latents"],
                                jnp.full(
                                    (batch_dev["latents"].shape[0],), 500.0
                                ),
                                batch_dev["y"], batch_dev.get("y_mask"),
                                batch_dev.get("img_hw"),
                                batch_dev.get("aspect_ratio"),
                            )
                            self.logger.error(format_overflow_report(
                                first_bad_module(
                                    inter,
                                    scan_group_sizes_from_config(
                                        self.model.cfg
                                    ),
                                )
                            ))
                        except Exception as e:  # noqa: BLE001 - best-effort
                            self.logger.error(f"forward trace failed: {e}")
                        raise FloatingPointError(f"non-finite params: {bad[:8]}")
                    buf.clear()
                if cfg.save_model_steps and step % cfg.save_model_steps == 0:
                    self.save(step)
                if (
                    cfg.get("eval_sampling_steps")
                    and cfg.get("visualize")
                    and step % cfg.eval_sampling_steps == 0
                ):
                    self.log_validation(step, batch_dev)
                if max_steps and step - start_step >= max_steps:
                    return self.state
            loader.skip_batches = 0  # fast-forward applies to one epoch only
            if (epoch + 1) % cfg.get("save_model_epochs", 1) == 0:
                self.save(step)
        return self.state

    def log_validation(self, step: int, batch_dev: Dict[str, Any]) -> None:
        """Periodic sampling with the EMA weights on the current captions.

        Spec: train.py:44-122 (log_validation, DPM-Solver 14 steps CFG 4.5,
        deterministic noise when configured, decoded images to the tracker
        at :93-118). We condition on the batch's (pre)computed embeddings;
        when the Trainer holds a VAE the latents are decoded and written as
        PNGs (+ TensorBoard when report_to='tensorboard'), otherwise raw
        latents are dumped to .npy for offline decode.
        """
        from pixart_sigma_tpu.diffusion.dpm_solver import (
            DPMSolver,
            NoiseScheduleVP,
            make_cfg_model_fn,
        )
        from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule

        from pixart_sigma_tpu.parallel.mesh import replicated

        cfg = self.config
        ns = NoiseScheduleVP(
            "discrete", betas=named_beta_schedule("linear", cfg.train_sampling_steps)
        )
        n = min(2, batch_dev["latents"].shape[0])
        seed = cfg.seed if cfg.get("deterministic_validation") else step

        # Multiprocess-safe: params/batch enter as (global) jit arguments —
        # never closed over (a closure bakes them in as constants, CLAUDE.md)
        # — noise comes from a static seed inside the program, and the output
        # is replicated so every process (and rank 0's numpy fetch) sees it.
        def sample_fn(params, y, y_mask, latents):
            y2 = y[:n]
            mask2 = jnp.concatenate([y_mask[:n]] * 2, axis=0)
            null_y = jnp.broadcast_to(
                params["y_embedder"]["y_embedding"][None], y2.shape
            ).astype(y2.dtype)

            def apply_fn(x, t_vec, cond, **kw):
                out = self.model.apply({"params": params}, x, t_vec, cond, mask2)
                return out[..., :4]

            model_fn = make_cfg_model_fn(
                apply_fn, ns, condition=y2, uncondition=null_y,
                cfg_scale=cfg.get("cfg_scale", 4.5),
            )
            solver = DPMSolver(model_fn, ns)
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), latents[:n].shape
            )
            return solver.sample(noise, steps=14, order=2)

        latents = jax.jit(sample_fn, out_shardings=replicated(self.mesh))(
            self.state.ema_params or self.state.params,
            batch_dev["y"], batch_dev["y_mask"], batch_dev["latents"],
        )
        if jax.process_index() != 0:
            return
        latents = np.asarray(latents) / cfg.scale_factor
        if self.vae is not None:
            from pixart_sigma_tpu.models.vae import AutoencoderKL

            imgs = jax.jit(
                lambda p, z: self.vae.apply(p, z, method=AutoencoderKL.decode)
            )(self.vae_params, jnp.asarray(latents))
            imgs = np.asarray(jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0))  # NHWC
            pngs = (imgs * 255).round().astype(np.uint8)
            from PIL import Image

            for i, arr in enumerate(pngs):
                out = os.path.join(
                    self.work_dir, f"validation_step_{step}_{i}.png"
                )
                Image.fromarray(arr).save(out)
            self.logger.info(
                f"validation images -> {self.work_dir}/validation_step_{step}_*.png"
            )
            if self.tracker is not None:
                self.tracker.add_images(step, "validation", imgs)
        else:
            out = os.path.join(self.work_dir, f"validation_step_{step}.npy")
            np.save(out, latents)
            self.logger.info(f"validation latents -> {out}")

    def save(self, step: int) -> None:
        # EVERY process calls into orbax: it coordinates shard writes and
        # barriers internally (a rank-0-only call would deadlock its sync);
        # non-primary processes write no data for replicated arrays.
        path = ckpt_io.save_train_state(
            os.path.join(self.work_dir, "checkpoints"), self.state, step
        )
        self.logger.info(f"saved checkpoint: {path}")


class _SimpleBatchSampler:
    """Shuffled full batches for single-scale datasets."""

    def __init__(self, n: int, batch_size: int, seed: int = 0, dataset=None):
        self.n = n
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self.dataset = dataset

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if self.dataset is not None and hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __iter__(self):
        import random

        order = list(range(self.n))
        random.Random(self.seed + self.epoch).shuffle(order)
        for i in range(0, self.n - self.batch_size + 1, self.batch_size):
            yield order[i : i + self.batch_size]

    def __len__(self) -> int:
        return max(1, self.n // self.batch_size)
