"""Trainer engine: ONE compiled train step per scheme, shared epoch machinery.

The reference duplicates its epoch loop / optimizer builder / early stopping /
eval in six trainer files (SURVEY.md section 2.9); here one engine owns them
and each *scheme* (reg, LMA, strainmat_pred, strainmat_LMA, joint_*) is a thin
adapter defining just the per-batch forward contract.

TPU-first design:
  * the whole fwd + loss + bwd + optimizer update is a single ``jax.jit``
    program (donated params/opt-state, no host sync inside the epoch);
  * batches are sharded over the mesh ``data`` axis; params replicated; XLA
    GSPMD inserts the gradient psum over ICI;
  * static shapes guaranteed by the Batcher (padded final batch + sample_mask),
    so each scheme compiles exactly twice (train step + eval step);
  * optimizers: optax adamw/sgd + cosine-annealing schedule, one per model
    (reference builds torch Adam/SGD + CosineAnnealingLR per model,
    joint_registration_strainmat_LMA.py:55-70, 20-44).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cardiax.data.loader import Batcher
from cardiax.io.metrics import MetricsTracker
from cardiax.losses.calculator import LossCalculator
from cardiax.losses.metrics import classification_metrics
from cardiax.parallel.mesh import get_mesh, replicate, shard_batch


# --------------------------------------------------------------------------- #
# Optimizers                                                                   #
# --------------------------------------------------------------------------- #

def build_optimizer(opt_conf: Dict[str, Any], steps_per_epoch: int,
                    total_epochs: int) -> optax.GradientTransformation:
    """Adam/SGD + optional cosine-annealing LR schedule
    (reference: build_optimizer + get_lr_scheduler, duplicated per trainer)."""
    lr = float(opt_conf.get("learning_rate", 1e-4))
    wd = float(opt_conf.get("weight_decay", 0.0))
    sched_conf = opt_conf.get("lr_scheduler", {}) or {}
    if sched_conf.get("enable", False) and sched_conf.get("type") == "CosineAnnealingLR":
        t_max_epochs = int(sched_conf.get("T_max", 30))
        eta_min = float(sched_conf.get("eta_min", 0.0))
        decay_steps = max(1, t_max_epochs * max(1, steps_per_epoch))
        schedule: Any = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=decay_steps, alpha=eta_min / lr if lr else 0.0)
    else:
        schedule = lr
    kind = opt_conf.get("type", "Adam").lower()
    if kind in ("adam", "adamw"):
        if not wd:
            return optax.adam(schedule)
        # torch.optim.Adam(weight_decay=wd) is COUPLED L2: wd*theta is added to
        # the gradient BEFORE the Adam moments (reference
        # joint_registration_strainmat_LMA.py:55-70, configs/config.json:139-152),
        # so reference configs must NOT map to optax.adamw (decoupled decay,
        # applied after the moments — a different optimizer trajectory).
        # AdamW is available opt-in via type: "AdamW" or
        # decoupled_weight_decay: true.
        if kind == "adamw" or bool(opt_conf.get("decoupled_weight_decay", False)):
            return optax.adamw(schedule, weight_decay=wd)
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule))
    if kind == "sgd":
        mom = float(opt_conf.get("momentum", 0.0))
        tx = optax.sgd(schedule, momentum=mom or None)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    raise ValueError(f"Unknown optimizer type {opt_conf.get('type')!r}")


# --------------------------------------------------------------------------- #
# Scheme protocol                                                              #
# --------------------------------------------------------------------------- #

class Scheme:
    """Per-batch contract of one training scheme.

    Subclasses define ``model_keys`` and a pure ``forward`` that maps
    (modules, params, device-batch) -> (pred_dict, target_dict). Everything
    else — jit, optimizers, epochs, early stopping, eval — is the engine's.
    """

    name: str = "base"
    model_keys: Tuple[str, ...] = ()

    def __init__(self, trainer_config: Dict[str, Any], full_config: Dict[str, Any]):
        self.trainer_config = trainer_config or {}
        self.full_config = full_config or {}

    # ---- host side -------------------------------------------------------- #
    def make_loader(self, dataset, batch_size: int, shuffle: bool, seed: int = 0):
        """Batch iterator for this scheme; the pairwise registration scheme
        overrides with the slice-grouping loader (SliceBatcher)."""
        return Batcher(dataset, batch_size, shuffle=shuffle, seed=seed)

    def init_params(self, modules: Dict[str, Any], rng: jax.Array,
                    batch: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError

    # ---- device side (pure, jitted by the engine) -------------------------- #
    def forward(self, modules: Dict[str, Any], params: Dict[str, Any],
                arrays: Dict[str, jnp.ndarray], train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def example_model_args(self, modules: Dict[str, Any], params: Dict[str, Any],
                           arrays: Dict[str, jnp.ndarray]
                           ) -> Dict[str, tuple]:
        """Per-model example ``module.apply`` args for compiled-artifact export
        (``save_model`` methods 'jit'/'onnx' — reference save_model's
        dummy-input construction, joint_registration_regression_trainer.py:
        1040-1049). Schemes override; models absent from the returned dict
        fall back to params-only export with a warning."""
        return {}

    # ---- visualization ------------------------------------------------------ #
    def visualize(self, batch: Dict[str, Any], preds_np: Dict[str, Any],
                  out_path) -> Optional[str]:
        """Periodic training-time figure (reference wandb_visualize_interval
        semantics, SURVEY.md 2.9/5.5): strain matrix + GT/pred TOS overlay
        when available, else None. Returns the saved path."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from cardiax.plot.strainmat import visualize_strainmat_with_TOS
        strain = None
        for key in ("strain_matrix", "strain_mat", "strainmat"):
            if key in batch and hasattr(batch[key], "ndim"):
                strain = np.asarray(batch[key][0])
                break
            if key in preds_np and hasattr(preds_np[key], "ndim"):
                strain = np.asarray(preds_np[key][0])
                break
        if strain is None or "TOS" not in batch:
            return None
        tos_gt = np.asarray(batch["TOS"][0])
        tos_pred = np.asarray(preds_np["TOS"][0]) if "TOS" in preds_np else None
        fig, _ = visualize_strainmat_with_TOS(strain, tos_gt=tos_gt,
                                              tos_pred=tos_pred)
        fig.savefig(out_path, dpi=90)
        plt.close(fig)
        return str(out_path)

    # ---- metrics ----------------------------------------------------------- #
    def performance(self, preds: List[Dict[str, Any]], dataset_name: str) -> Dict[str, float]:
        """Default: TOS sector error + classification metrics when present
        (reference joint_registration_strainmat_LMA.py:384-428)."""
        perf: Dict[str, float] = {}
        err_sum, n_sec = 0.0, 0.0
        logits_all, labels_all = [], []
        for p in preds:
            if "TOS_pred" in p and "TOS" in p:
                err_sum += float(np.abs(np.asarray(p["TOS_pred"]) - np.asarray(p["TOS"])).sum())
                n_sec += np.asarray(p["TOS"]).size
            if "sector_LMA_labels_pred" in p and "sector_LMA_labels" in p:
                logits_all.append(np.asarray(p["sector_LMA_labels_pred"]))
                labels_all.append(np.asarray(p["sector_LMA_labels"]))
            elif "slice_LMA_label_pred" in p and "slice_LMA_label" in p:
                logits_all.append(np.asarray(p["slice_LMA_label_pred"])[..., None])
                labels_all.append(np.asarray(p["slice_LMA_label"]))
        if n_sec > 0:
            perf[f"final-{dataset_name}/sector_error"] = err_sum / n_sec
        if logits_all:
            cm = classification_metrics(np.stack(logits_all), np.stack(labels_all))
            for k, v in cm.items():
                perf[f"final-{dataset_name}/{k}"] = v
        return perf


# --------------------------------------------------------------------------- #
# Engine                                                                       #
# --------------------------------------------------------------------------- #

class TrainerEngine:
    def __init__(self, scheme: Scheme, trainer_config: Dict[str, Any],
                 full_config: Dict[str, Any], mesh=None):
        self.scheme = scheme
        self.trainer_config = trainer_config or {}
        self.full_config = full_config or {}
        self.mesh = mesh if mesh is not None else get_mesh()
        self.loss_calc = LossCalculator(self.full_config.get("losses", {}))
        self.metric_prefix = self.trainer_config.get("metric_prefix", "")
        self._train_step = None
        self._eval_step = None
        self._snap_fn = None   # jitted whole-tree params copy (pipelining)
        self.params: Optional[Dict[str, Any]] = None
        self.opt_states: Optional[Dict[str, Any]] = None
        self._txs: Optional[Dict[str, optax.GradientTransformation]] = None
        self.modules: Dict[str, Any] = {}
        self.bundles: Dict[str, Any] = {}
        self._warned_visualization = False
        self._warned_disp_band = False
        # the banded warp clamps |disp| at final_warp_radius - 1 px; warn when
        # training displacements approach it (silent clamping would otherwise
        # be invisible on data with larger-than-measured deformations)
        radii = [int(mc.get("final_warp_radius", 12))
                 for mc in self.full_config.get("networks", {}).values()
                 if isinstance(mc, dict)]
        self._disp_band = (max(radii) if radii else 12) - 1

    def _check_displacement_band(self, max_disp: float) -> None:
        if not self._warned_disp_band and max_disp > 0.9 * self._disp_band:
            self._warned_disp_band = True
            import warnings
            warnings.warn(
                f"max |displacement| {max_disp:.2f} px is within 10% of the "
                f"banded-warp clamp ({self._disp_band} px); raise "
                f"networks.*.final_warp_radius to avoid saturation",
                RuntimeWarning)

    # ---- compiled steps ---------------------------------------------------- #
    def _make_steps(self):
        scheme, loss_calc, txs = self.scheme, self.loss_calc, self._txs
        modules = self.modules

        def loss_fn(params, arrays, train):
            preds, targets = scheme.forward(modules, params, arrays, train)
            total, values = loss_calc(preds, targets)
            if "displacement" in preds:
                # band-saturation guard for the banded warp kernels: the max
                # |u_inv| this batch (see _check_displacement_band)
                values = dict(values,
                              max_abs_displacement=jnp.max(
                                  jnp.abs(preds["displacement"])))
            return total, (values, preds)

        def train_step(params, opt_states, arrays):
            (_, (values, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, arrays, True)
            new_params, new_states = {}, {}
            for name in params:
                if name in txs:
                    upd, st = txs[name].update(grads[name], opt_states[name], params[name])
                    new_params[name] = optax.apply_updates(params[name], upd)
                    new_states[name] = st
                else:  # no optimizer configured for this model -> frozen
                    new_params[name] = params[name]
                    new_states[name] = opt_states.get(name)
            return new_params, new_states, values

        def eval_step(params, arrays):
            _, (values, preds) = loss_fn(params, arrays, False)
            return values, preds

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)
        # raw (un-jitted) cores for the fused-epoch scan programs
        self._train_step_fn = train_step
        self._eval_step_fn = eval_step

    def _build_epoch_fns(self, loader, for_eval: bool = False,
                         unroll_cap: int = 16):
        """One jitted program for a WHOLE epoch: ``lax.scan`` of the step
        core over the epoch's (n_steps, batch) index/mask matrices, gathering
        each batch on-device from the loader's resident dataset
        (``training.epoch_fuse``). On a tunneled TPU every per-step dispatch
        and index upload costs a host round trip (measured ~10-60 ms each,
        STATUS round 4); fusing collapses an epoch's 2*n_steps dispatches
        into one dispatch + one bulk metric sync. Math and batch schedule are
        identical to the step loop (epoch_plan == __iter__ feed; the scan
        body is the same step core), pinned by tests/test_epoch_fuse.py."""
        out_sh = getattr(loader, "_out_sh", None)
        step = self._eval_step_fn if for_eval else self._train_step_fn

        def gather(data, idx, mask):
            arrays = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            arrays["sample_mask"] = mask
            if out_sh is not None:
                arrays = {k: (jax.lax.with_sharding_constraint(v, out_sh[k])
                              if k in out_sh else v)
                          for k, v in arrays.items()}
            return arrays

        # Short epochs unroll fully: a rolled scan double-buffers the whole
        # params+opt-state carry every iteration (measured 0.83x vs the step
        # loop at 5 steps/epoch); straight-line code keeps the donation
        # in-place. Long epochs keep the ROLLED scan: measured at 36
        # steps/epoch on v5e (tools/probe_fuse_scale.py round 5,
        # exp_results/fuse_scale.json) rolled = 0.247 s/epoch = 1.82x the
        # step loop AND faster than chunked (unroll=8/16: 0.257/0.260) and
        # fully-unrolled (0.258) with 4-8x less compile time — the carry
        # copy amortizes over the long epoch while dispatch savings dominate.
        cap = max(1, int(unroll_cap))

        def _unroll(n_steps: int):
            return True if n_steps <= cap else 1

        if for_eval:
            def epoch_eval(params, data, idx_mat, mask_mat):
                def body(carry, xs):
                    idx, mask = xs
                    values, _ = step(params, gather(data, idx, mask))
                    return carry, values    # preds dropped -> DCE'd by XLA
                _, stacked = jax.lax.scan(body, None, (idx_mat, mask_mat),
                                          unroll=_unroll(idx_mat.shape[0]))
                return stacked
            return jax.jit(epoch_eval)

        def epoch_train(params, opt_states, data, idx_mat, mask_mat):
            def body(carry, xs):
                p, s = carry
                idx, mask = xs
                p, s, values = step(p, s, gather(data, idx, mask))
                return (p, s), values
            (params, opt_states), stacked = jax.lax.scan(
                body, (params, opt_states), (idx_mat, mask_mat),
                unroll=_unroll(idx_mat.shape[0]))
            return params, opt_states, stacked
        return jax.jit(epoch_train, donate_argnums=(0, 1))

    def _build_epoch_trainval_fn(self, train_loader, val_loader,
                                 unroll_cap: int = 16):
        """Train epoch + validation epoch as ONE jitted program -> ONE
        dispatch and ONE bulk metric sync per epoch. On the tunneled TPU a
        dispatch costs a host round trip (STATUS round 4 measured ~tens of
        ms for even a tiny op), so at valid_period 1 the separate val
        dispatch+sync is a fixed per-epoch tax this program deletes. The val
        scan consumes the POST-epoch params — identical semantics to the
        separate val program."""
        out_sh_t = getattr(train_loader, "_out_sh", None)
        out_sh_v = getattr(val_loader, "_out_sh", None)
        train_step = self._train_step_fn
        eval_step = self._eval_step_fn
        cap = max(1, int(unroll_cap))

        def gather(data, idx, mask, out_sh):
            arrays = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            arrays["sample_mask"] = mask
            if out_sh is not None:
                arrays = {k: (jax.lax.with_sharding_constraint(v, out_sh[k])
                              if k in out_sh else v)
                          for k, v in arrays.items()}
            return arrays

        def _unroll(n_steps: int):
            return True if n_steps <= cap else 1

        def epoch_train_val(params, opt_states, data, idx_mat, mask_mat,
                            vdata, vidx_mat, vmask_mat):
            def body(carry, xs):
                p, s = carry
                idx, mask = xs
                p, s, values = train_step(p, s, gather(data, idx, mask,
                                                       out_sh_t))
                return (p, s), values
            (params, opt_states), stacked = jax.lax.scan(
                body, (params, opt_states), (idx_mat, mask_mat),
                unroll=_unroll(idx_mat.shape[0]))

            def vbody(carry, xs):
                idx, mask = xs
                values, _ = eval_step(params, gather(vdata, idx, mask,
                                                     out_sh_v))
                return carry, values      # preds dropped -> DCE'd
            _, vstacked = jax.lax.scan(vbody, None, (vidx_mat, vmask_mat),
                                       unroll=_unroll(vidx_mat.shape[0]))
            return params, opt_states, stacked, vstacked
        return jax.jit(epoch_train_val, donate_argnums=(0, 1))

    # ---- setup -------------------------------------------------------------- #
    def setup(self, models: Dict[str, Any], example_batch: Dict[str, Any],
              steps_per_epoch: int, seed: int = 2434):
        self.bundles = models
        self.modules = {k: m.module for k, m in models.items()}
        rng = jax.random.PRNGKey(seed)
        if self.params is None:
            existing = {k: m.params for k, m in models.items() if m.params is not None}
            if len(existing) == len(models):
                self.params = existing
            else:
                self.params = self.scheme.init_params(self.modules, rng, example_batch)
                for k, m in models.items():
                    m.params = self.params[k]
        total_epochs = int(self.trainer_config.get("epochs", 1))
        opt_confs = self.trainer_config.get("optimizers", {})
        self._txs = {}
        self.opt_states = {}
        for name in self.params:
            conf = opt_confs.get(name)
            if conf is None:
                continue
            tx = build_optimizer(conf, steps_per_epoch, total_epochs)
            self._txs[name] = tx
            self.opt_states[name] = tx.init(self.params[name])
        self.params = replicate(self.params, self.mesh)
        self.opt_states = replicate(self.opt_states, self.mesh)
        self._make_steps()
        self._log_kernel_plans(example_batch)

    def _log_kernel_plans(self, batch: Dict[str, Any]) -> None:
        """One-line report of which compute path each hot stage will take at
        this run's frame size (VERDICT r2 #3: no silent kernel selection).
        Frame-shaped inputs: (..., H, W) with H, W >= 16."""
        # (H, W) axis positions per key: cine_myo_mask (B,1,T,H,W) and
        # source_img (B,1,H,W) end in (H, W); displacement_field is
        # (B,2,H,W,T) — time LAST (datasets.py StrainMatDataset), so its
        # frame dims sit one axis earlier
        hw = None
        for key, (ha, wa) in (("cine_myo_mask", (-2, -1)),
                              ("source_img", (-2, -1)),
                              ("displacement_field", (-3, -2))):
            v = batch.get(key)
            if v is not None and getattr(v, "ndim", 0) >= 3:
                hw = (int(v.shape[ha]), int(v.shape[wa]))
                break
        if hw is None:
            return
        h, w = hw
        if min(h, w) < 16:
            return
        from cardiax.ops.shooting import scan_plan
        from cardiax.ops.warp_pallas import warp_plan
        plans = []
        for name, mc in self.full_config.get("networks", {}).items():
            if not isinstance(mc, dict) or "n_integration_steps" not in mc \
                    and mc.get("type") not in ("JointRegisterStrainMatNet",
                                               "RegistrationNet",
                                               "VoxelmorphLike"):
                continue
            ds = int(mc.get("shoot_downsample", 2))
            ds = ds if ds > 1 and h % ds == 0 and w % ds == 0 \
                and min(h, w) >= 4 * ds else 1
            exact = bool(mc.get("exact_warp", False))
            radius = None if exact else 8
            plans.append(
                f"{name}: scan={scan_plan(h // ds, w // ds, radius)}"
                f"@{h // ds}x{w // ds}, final_warp="
                f"{'xla_gather' if exact else warp_plan(h, w, int(mc.get('final_warp_radius', 12)))}")
        if plans:
            print(f"kernel plans ({h}x{w}): " + "; ".join(plans))

    # ---- training loop ------------------------------------------------------ #
    def _maybe_device_cache(self, loader, cfg: Dict[str, Any], tag: str):
        """Swap a plain host Batcher for a DeviceBatcher (dataset resident in
        device memory, batches gathered on-device by index) when
        ``training.device_data_cache`` allows: "auto" (default) enables it
        when the stacked dataset fits ``device_data_cache_budget_mb``
        (default 512); true forces; false disables. Exact Batcher semantics
        (the Batcher's own RNG is handed over, so the shuffle stream is
        unchanged). Removes the per-step host->device batch transfer that
        dominates wall time on weak-host/tunneled platforms (STATUS.md)."""
        from cardiax.data.loader import DeviceBatcher
        raw = cfg.get("device_data_cache", "auto")
        mode = "auto" if raw is None else str(raw).lower()
        if mode in ("false", "0", "off", "none", "no"):
            return loader
        force = mode in ("true", "1", "yes", "on")
        if not force and mode != "auto":
            # a typo ('ture', 'flase', ...) must not silently mean "auto"
            raise ValueError(
                f"training.device_data_cache={raw!r} is not a recognized "
                f"value; use true/false/auto")
        if not isinstance(loader, Batcher) or loader.drop_last \
                or not loader.pad_final or len(loader.dataset) == 0:
            if force:
                import warnings
                warnings.warn(
                    f"device_data_cache({tag}): requested but this loader "
                    f"({type(loader).__name__}) is not cacheable — only the "
                    f"plain Batcher path is; using the host loader",
                    RuntimeWarning)
            return loader
        item0 = loader.dataset[0]
        est = len(loader.dataset) * sum(
            v.nbytes for v in item0.values() if isinstance(v, np.ndarray))
        budget = float(cfg.get("device_data_cache_budget_mb", 512)) * 2 ** 20
        if not force and est > budget:
            return loader
        try:
            cached = DeviceBatcher(loader.dataset, loader.batch_size,
                                   shuffle=loader.shuffle, mesh=self.mesh,
                                   seed=loader.seed, epoch=loader._epoch)
        except Exception as e:  # ragged items, OOM, ... -> host path
            import warnings
            warnings.warn(f"device_data_cache({tag}): falling back to the "
                          f"host Batcher: {e}", RuntimeWarning)
            return loader
        print(f"device_data_cache: {tag} dataset resident on device "
              f"({est / 2**20:.0f} MB, {len(loader.dataset)} items)")
        return cached

    def train(self, models: Dict[str, Any], datasets: Dict[str, Any],
              trainer_config: Dict[str, Any] | None = None,
              full_config: Dict[str, Any] | None = None, device=None,
              use_tensorboard: bool = False, tensorboard_log_dir: str = "tensorboard",
              use_wandb: bool = False, enable_wandb_upload: bool = True,
              tracker: Optional[MetricsTracker] = None,
              ) -> Tuple[Dict[str, Any], Optional[MetricsTracker]]:
        cfg = trainer_config or self.trainer_config
        epochs = int(cfg.get("epochs", 1))
        batch_size = int(cfg.get("batch_size", 10))
        seed = int(cfg.get("seed", 2434))
        tolerance = int(cfg.get("epochs_without_improvement_tolerance", 50))
        test_as_val = bool(cfg.get("test_as_val", False))
        # which logged metric drives early stopping / best-params (reference
        # --early-stop-metric); default: total val loss, else total train loss
        early_stop_metric = cfg.get("early_stop_metric")
        # validate every k epochs (reference others.valid_period)
        valid_period = max(1, int(self.full_config.get("others", {})
                                  .get("valid_period", 1)))

        train_ds = datasets["train"]
        if len(train_ds) == 0:
            raise ValueError("train dataset is empty — check split patterns "
                             "against the data's subject ids")
        val_name = "test" if test_as_val and "test" in datasets else "val"
        val_ds = datasets.get(val_name)

        train_loader = self.scheme.make_loader(train_ds, batch_size, shuffle=True, seed=seed)
        val_loader = self.scheme.make_loader(val_ds, batch_size, shuffle=False) \
            if val_ds is not None and len(val_ds) > 0 else None
        train_loader = self._maybe_device_cache(train_loader, cfg, "train")
        if val_loader is not None:
            val_loader = self._maybe_device_cache(val_loader, cfg, "val")

        if tracker is None:
            tracker = MetricsTracker(
                use_wandb=use_wandb, use_tensorboard=use_tensorboard,
                log_dir=self.full_config.get("saving", {}).get("saving_dir"),
                run_name=self.full_config.get("info", {}).get("experiment_name", "cardiax"))

        first_batch = next(iter(train_loader))
        self.setup(models, first_batch, steps_per_epoch=len(train_loader), seed=seed)

        # ---- checkpointing / resume (SURVEY.md 5.4: real resume, unlike the
        # reference's save-only persistence) ----
        best_val = float("inf")
        # params are DONATED to the compiled train step, so best-params
        # snapshots must be real copies, not aliases of soon-invalidated buffers
        best_params = jax.tree_util.tree_map(jnp.copy, self.params)
        best_epoch = -1
        epochs_without_improvement = 0
        ckpt = None
        start_epoch = 0
        saving = self.full_config.get("saving", {})
        if saving.get("save_checkpoint") and saving.get("saving_dir"):
            from cardiax.io.checkpoints import CheckpointManager
            ckpt = CheckpointManager(
                str(Path(saving["saving_dir"]) / "checkpoints"),
                max_to_keep=int(saving.get("save_model_num", 3)),
                save_interval_epochs=int(saving.get("checkpoint_interval", 1)))
            if cfg.get("resume", False) and ckpt.latest_epoch() is not None:
                # FULL training-state resume: params + opt state + best-params
                # + early-stop counters, so a resumed run is step-for-step the
                # uninterrupted run (epoch-indexed shuffle makes the data
                # stream match too; certified by tools/stability_run.py)
                template = {"params": self.params, "opt_states": self.opt_states,
                            "best_params": best_params,
                            "extra": {"epoch": 0, "best_val": 0.0,
                                      "best_epoch": 0,
                                      "epochs_without_improvement": 0}}
                state = ckpt.restore(template=template)
                self.params = state["params"]
                self.opt_states = state["opt_states"]
                best_params = state["best_params"]
                extra = state["extra"]
                best_val = float(extra["best_val"])
                best_epoch = int(extra["best_epoch"])
                epochs_without_improvement = int(
                    extra["epochs_without_improvement"])
                start_epoch = int(extra["epoch"]) + 1

        history: List[Dict[str, float]] = []
        # best-epoch metric snapshot rides as a sidecar JSON (not a pytree of
        # arrays, so not in the orbax state): without it a resumed run that
        # never improves again would skip the final `best-` relog
        best_metrics_path = None
        best_epoch_metrics = {}
        if ckpt is not None:
            best_metrics_path = ckpt.directory / "best_metrics.json"
            if start_epoch > 0 and best_metrics_path.exists():
                import json as _json
                best_epoch_metrics = _json.loads(
                    best_metrics_path.read_text())
        prefix = self.metric_prefix
        t_start = time.perf_counter()

        # ---- periodic visualization interval (reference others.
        # wandb_visualize_interval = fraction of total epochs) ----
        vis_interval = self.full_config.get("others", {}).get(
            "wandb_visualize_interval", 0)
        vis_every = max(1, int(float(vis_interval) * epochs)) if vis_interval \
            and self.full_config.get("saving", {}).get("saving_dir") else 0

        # ---- optional profiler trace of the first few steps (SURVEY.md 5.1:
        # the reference has no tracing; jax.profiler makes it near-free) ----
        profile_dir = self.full_config.get("others", {}).get("profile_dir")
        profile_steps = int(self.full_config.get("others", {}).get("profile_steps", 5))
        profiling = False
        global_step = 0
        # Deferred metric sync (below) would otherwise postpone NaN / band
        # detection to the epoch end — on long epochs that wastes up to an
        # epoch of dispatched compute. Sync ONE scalar every N steps to bound
        # the detection latency while keeping async dispatch (0 disables).
        spot_every = int(cfg.get("metric_spot_check_steps", 50))
        # Opt-in per-epoch host wall-time metric (training.log_epoch_walltime).
        # Measured from epoch start to after the epoch-end device_get syncs, so
        # it reflects real train+val wall including device completion. Off by
        # default: the extra key would break bit-equality row comparisons
        # (tools/stability_run.py) and it is only meaningful for benchmarking.
        log_wall = bool(cfg.get("log_epoch_walltime", False))
        # Opt-in host-phase attribution (training.host_profile): per-epoch
        # perf_counter stamps of every host-side segment of the fused-epoch
        # loop (plan build, dispatch, metric sync, val, tracker IO,
        # best/ckpt), collected on self.host_profile_rows for
        # tools/profile_epoch_host.py — the evidence basis for attacking the
        # wall-vs-device-step gap (VERDICT r4 #3).
        host_profile = bool(cfg.get("host_profile", False))
        host_rows: List[Dict[str, float]] = []
        self.host_profile_rows = host_rows

        # ---- fused-epoch programs (training.epoch_fuse, default 'auto'):
        # one jitted lax.scan per epoch over the DeviceBatcher's index
        # matrices instead of 2*n_steps per-step dispatches — each dispatch
        # and index upload is a host round trip on a tunneled TPU. Requires
        # the device-resident cache; step-granular hooks (profiler window,
        # mid-epoch spot checks) are epoch-granular in this mode. Default
        # flipped false -> 'auto' after the resume certification (fused
        # interrupted+resumed == fused uninterrupted bit-exactly,
        # tests/test_epoch_fuse.py::test_epoch_fuse_resume_equals_
        # uninterrupted + the TPU drive in exp_results/stability_fused). ----
        fuse_raw = cfg.get("epoch_fuse", "auto")
        fuse_mode = "false" if fuse_raw is None else str(fuse_raw).lower()
        if fuse_mode in ("false", "0", "off", "none", "no"):
            fuse_want, fuse_force = False, False
        elif fuse_mode in ("true", "1", "yes", "on"):
            fuse_want, fuse_force = True, True
        elif fuse_mode == "auto":
            fuse_want, fuse_force = True, False
        else:
            raise ValueError(f"training.epoch_fuse={fuse_raw!r} is not a "
                             f"recognized value; use true/false/auto")
        # Engagement policy: `auto` fuses whenever the train loader is
        # device-resident, at ANY epoch length — both regimes are measured
        # on TPU: unrolled (<= `epoch_fuse_max_steps` steps, default 16) won
        # 0.155 vs 0.166 s/epoch at 5 steps (STATUS round 4), and the rolled
        # scan won 1.82x over the step loop at 36 steps/epoch (round 5,
        # tools/probe_fuse_scale.py — the round-4 "rolled loses 17%" result
        # holds only at ~5 steps, where the carry double-buffering is not
        # amortized; `_build_epoch_fns._unroll` picks the regime).
        fuse_cap = int(cfg.get("epoch_fuse_max_steps", 16))
        fuse_train_fn = fuse_val_fn = None
        if fuse_want and not profile_dir:
            train_resident = getattr(train_loader, "device_resident", False)
            if train_resident:
                fuse_train_fn = self._build_epoch_fns(
                    train_loader, unroll_cap=fuse_cap)
            elif fuse_force:
                import warnings
                warnings.warn(
                    "epoch_fuse: requested but the train loader is not "
                    "device-resident (device_data_cache off or not "
                    "cacheable); using the step loop", RuntimeWarning)
            # Val fuses ONLY when train fused (or under an explicit `true`):
            # fused vs loop is float-reorder-different, and best-epoch
            # selection rides val metrics — train and val must stay in ONE
            # numerics regime regardless of which loaders happened to cache.
            if (fuse_train_fn is not None or fuse_force) \
                    and val_loader is not None \
                    and getattr(val_loader, "device_resident", False):
                fuse_val_fn = self._build_epoch_fns(
                    val_loader, for_eval=True, unroll_cap=fuse_cap)
        # train+val as ONE dispatch (jit compiles lazily, so on a
        # valid_period-1 run the separate train-only/val-only programs above
        # never compile — they serve the epochs where val is skipped)
        fuse_trainval_fn = None
        if fuse_train_fn is not None and fuse_val_fn is not None:
            fuse_trainval_fn = self._build_epoch_trainval_fn(
                train_loader, val_loader, unroll_cap=fuse_cap)
        elif fuse_want and profile_dir and fuse_force:
            # auto mode degrades silently; only an explicit `true` warns
            import warnings
            warnings.warn("epoch_fuse: disabled while others.profile_dir is "
                          "set (the profiler window is step-granular)",
                          RuntimeWarning)
        # introspection hooks for tests / tools: which paths actually engaged
        self.last_fuse_engaged = (fuse_train_fn is not None,
                                  fuse_val_fn is not None)
        self.last_fuse_trainval = fuse_trainval_fn is not None

        # ---- epoch pipelining (training.epoch_pipeline, default 'auto'):
        # dispatch epoch k+1 BEFORE syncing epoch k's metrics. The fused
        # dispatch returns device futures; the bulk metric sync then waits
        # for (device compute + tunnel transfer) while the chip sits idle
        # during the transfer. Holding one epoch in flight hides the
        # transfer + host bookkeeping behind the next epoch's compute
        # (host_profile round 5: ~26 ms of the 110 ms epoch wall is
        # post-compute sync residue). Numerics are BIT-IDENTICAL to the
        # unpipelined fused loop: the same jitted programs run on the same
        # inputs in the same order — only the host-side read of each
        # epoch's metrics is deferred by one epoch, plus one device-side
        # jnp.copy of the params per epoch (the best-params snapshot must
        # be taken before the next dispatch donates the buffers). Pinned by
        # tests/test_epoch_pipeline.py. Engagement ('auto') requires the
        # fused path, no checkpointing (ckpt needs epoch-k opt state on
        # host) and — when a val loader exists — the combined train+val
        # dispatch (a separate val program would read the NEXT epoch's
        # params); periodic visualization renders from the processed
        # epoch's snapshot, so it composes with the pipeline.
        # Early-stop decisions lag one epoch behind dispatch, so a stop at
        # epoch k discards one speculative in-flight epoch; the returned
        # best-params/metrics are unaffected.
        pipe_raw = cfg.get("epoch_pipeline", "auto")
        pipe_mode = "false" if pipe_raw is None else str(pipe_raw).lower()
        if pipe_mode in ("false", "0", "off", "none", "no"):
            pipe_want, pipe_force = False, False
        elif pipe_mode in ("true", "1", "yes", "on"):
            pipe_want, pipe_force = True, True
        elif pipe_mode == "auto":
            pipe_want, pipe_force = True, False
        else:
            raise ValueError(f"training.epoch_pipeline={pipe_raw!r} is not "
                             f"a recognized value; use true/false/auto")
        pipeline_on = (pipe_want and fuse_train_fn is not None
                       and ckpt is None
                       and (val_loader is None
                            or fuse_trainval_fn is not None))
        if pipe_force and not pipeline_on:
            import warnings
            warnings.warn(
                "epoch_pipeline: requested but cannot engage (needs the "
                "fused-epoch path, save_checkpoint off, and the combined "
                "train+val dispatch when validating); using the "
                "synchronous loop", RuntimeWarning)
        self.last_pipeline_engaged = pipeline_on
        # selection transparency (docs/kernels.md section 6): one line per
        # run stating which epoch-loop mode actually engaged
        if fuse_train_fn is not None:
            mode_bits = [f"fused(unroll<={fuse_cap})"]
            if fuse_trainval_fn is not None:
                mode_bits.append("combined train+val")
            if pipeline_on:
                mode_bits.append("pipelined")
            print(f"epoch loop: {' + '.join(mode_bits)}")

        pipe_q: List[Dict[str, Any]] = []
        last_wall_done_t: Optional[float] = None   # for cadence-based log_wall
        epoch_iter: List[Optional[int]] = list(range(start_epoch, epochs))
        if pipeline_on:
            epoch_iter.append(None)   # flush slot: process the last in-flight
        for epoch in epoch_iter:
            rec: Optional[Dict[str, Any]] = None
            if epoch is None:
                # pipeline flush — nothing to dispatch, process the tail
                if not pipe_q:
                    break
                rec = pipe_q.pop(0)
            else:
                t_epoch = time.perf_counter()
                ht = {} if host_profile else None
                # epoch-indexed shuffle: a resumed run replays the
                # uninterrupted run's epoch-k..N data stream exactly
                # (loader.epoch_permutation)
                if hasattr(train_loader, "set_epoch"):
                    train_loader.set_epoch(epoch)
                run_val_now = val_loader is not None and (
                    epoch % valid_period == 0 or epoch == epochs - 1)
                if fuse_train_fn is not None:
                    t0 = time.perf_counter()
                    idx_mat, mask_mat = train_loader.epoch_plan()
                    if ht is not None:
                        ht["plan"] = time.perf_counter() - t0
                        t0 = time.perf_counter()
                    if fuse_trainval_fn is not None and run_val_now:
                        # train epoch + val epoch: ONE dispatch, ONE bulk sync
                        vidx_mat, vmask_mat = val_loader.epoch_plan()
                        (self.params, self.opt_states, stacked,
                         vstacked) = fuse_trainval_fn(
                            self.params, self.opt_states, train_loader._data,
                            idx_mat, mask_mat, val_loader._data,
                            vidx_mat, vmask_mat)
                    else:
                        # whole train epoch in ONE dispatch; stacked metrics
                        self.params, self.opt_states, stacked = fuse_train_fn(
                            self.params, self.opt_states, train_loader._data,
                            idx_mat, mask_mat)
                        vstacked = None
                    if ht is not None:
                        ht["dispatch"] = time.perf_counter() - t0
                    rec = {"epoch": epoch, "t_epoch": t_epoch, "ht": ht,
                           "run_val_now": run_val_now,
                           "n_batches": int(idx_mat.shape[0]),
                           "stacked": stacked, "vstacked": vstacked}
                    global_step += rec["n_batches"]
                    if pipeline_on:
                        # snapshot BEFORE the next dispatch donates these
                        # buffers; if this epoch turns out to be the best,
                        # the snapshot IS the best-params copy. ONE jitted
                        # program (not per-leaf jnp.copy): each dispatch is
                        # a host round trip on a tunneled TPU, and a params
                        # tree has hundreds of leaves.
                        if self._snap_fn is None:
                            self._snap_fn = jax.jit(
                                lambda p: jax.tree_util.tree_map(
                                    jnp.copy, p))
                        rec["snap"] = self._snap_fn(self.params)
                        pipe_q.append(rec)
                        if len(pipe_q) < 2:
                            continue       # fill the pipeline (one in flight)
                        rec = pipe_q.pop(0)
            # ---- process one epoch's results (rec: fused epoch; else the
            # per-step loop below) ----
            accum: Dict[str, float] = {}
            n_batches = 0
            # Per-step metric values stay ON DEVICE until the epoch ends:
            # float() is a blocking device sync (and a tunnel round trip per
            # value on remote platforms) — pulling every metric every step
            # serializes the loop against the device and forfeits JAX's async
            # dispatch. Deferring costs only a list of tiny DeviceArrays.
            step_values: List[Dict[str, Any]] = []
            pending_vsynced = None   # val metrics from the combined dispatch
            if rec is not None:
                proc_epoch = int(rec["epoch"])
                t_epoch = rec["t_epoch"]
                ht = rec["ht"]
                run_val_now = rec["run_val_now"]
                n_batches = rec["n_batches"]
                t0 = time.perf_counter()
                if rec["vstacked"] is not None:
                    synced, pending_vsynced = jax.device_get(
                        (rec["stacked"], rec["vstacked"]))
                else:
                    synced = jax.device_get(rec["stacked"])
                if ht is not None:
                    ht["sync"] = time.perf_counter() - t0
                step_values = [{k: v[i] for k, v in synced.items()}
                               for i in range(n_batches)]
                if spot_every and step_values and not np.isfinite(
                        float(step_values[-1].get("total_loss", 0.0))):
                    raise FloatingPointError(
                        f"non-finite total_loss at epoch {proc_epoch} "
                        f"(fused-epoch check)")
            else:
                proc_epoch = epoch
            for batch in (() if rec is not None else train_loader):
                if profile_dir and global_step == 1 and not profiling:
                    # drain the compile step BEFORE opening the trace window —
                    # with deferred metric sync nothing else blocks here, and
                    # step-0 device execution would pollute the trace (when
                    # step 0 fell in a previous 1-batch epoch, its epoch-end
                    # device_get already synced)
                    if step_values:
                        float(step_values[-1]["total_loss"])
                    jax.profiler.start_trace(profile_dir)   # skip compile step
                    profiling = True
                arrays = shard_batch(batch, self.mesh)
                arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}
                self.params, self.opt_states, values = self._train_step(
                    self.params, self.opt_states, arrays)
                step_values.append(values)
                n_batches += 1
                global_step += 1
                if spot_every and global_step % spot_every == 0:
                    fv = float(values["total_loss"])  # bounded-latency sync
                    if not np.isfinite(fv):
                        raise FloatingPointError(
                            f"non-finite total_loss {fv} at epoch {proc_epoch} "
                            f"step {global_step} (spot check)")
                    if "max_abs_displacement" in values:
                        self._check_displacement_band(
                            float(values["max_abs_displacement"]))
                if profiling and global_step > profile_steps:
                    float(values["total_loss"])  # real sync (axon: block_until_ready is a no-op)
                    jax.profiler.stop_trace()
                    profiling = False
                    from cardiax.io.profiling import print_trace_summary
                    print_trace_summary(profile_dir)
            # ONE bulk transfer for the whole epoch's metric scalars
            # (per-value float() would still pay a tunnel round trip each)
            for values in jax.device_get(step_values):
                for k, v in values.items():
                    if k == "max_abs_displacement":   # epoch max, not mean
                        fv = float(v)
                        accum[k] = max(accum.get(k, 0.0), fv)
                        self._check_displacement_band(fv)
                    else:
                        accum[k] = accum.get(k, 0.0) + float(v)
            epoch_metrics = {f"{prefix}train/{k}":
                             (v if k == "max_abs_displacement"
                              else v / max(1, n_batches))
                             for k, v in accum.items()}

            # ---- val ----
            epoch_total_val = None
            if run_val_now:
                t_val = time.perf_counter()
                vaccum: Dict[str, float] = {}
                nv = 0
                val_values: List[Dict[str, Any]] = []
                if pending_vsynced is not None:
                    # already computed inside the combined train+val dispatch
                    nv = int(next(iter(pending_vsynced.values())).shape[0])
                    val_values = [{k: v[i]
                                   for k, v in pending_vsynced.items()}
                                  for i in range(nv)]
                elif fuse_val_fn is not None:
                    vidx, vmask = val_loader.epoch_plan()
                    vstacked = fuse_val_fn(self.params, val_loader._data,
                                           vidx, vmask)
                    nv = int(vidx.shape[0])
                    vsynced = jax.device_get(vstacked)
                    val_values = [{k: v[i] for k, v in vsynced.items()}
                                  for i in range(nv)]
                _val_fused = pending_vsynced is not None \
                    or fuse_val_fn is not None
                for batch in (() if _val_fused else val_loader):
                    arrays = shard_batch(batch, self.mesh)
                    arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}
                    values, _ = self._eval_step(self.params, arrays)
                    val_values.append(values)
                    nv += 1
                for values in jax.device_get(val_values):  # bulk deferred sync
                    for k, v in values.items():
                        vaccum[k] = vaccum.get(k, 0.0) + float(v)
                for k, v in vaccum.items():
                    epoch_metrics[f"{prefix}val/{k}"] = v / max(1, nv)
                epoch_total_val = epoch_metrics.get(f"{prefix}val/total_loss")
                if ht is not None:
                    ht["val"] = time.perf_counter() - t_val

            if log_wall:
                # Under epoch pipelining the dispatch->processed span of one
                # epoch OVERLAPS the next epoch's compute, so it would read
                # ~2 epochs; log the CADENCE (time since the previous epoch
                # was processed) instead — the honest steady-state wall per
                # epoch, and identical to the span in the synchronous loop.
                now = time.perf_counter()
                if pipeline_on and last_wall_done_t is not None:
                    epoch_metrics[f"{prefix}time/epoch_wall_s"] = (
                        now - last_wall_done_t)
                else:
                    epoch_metrics[f"{prefix}time/epoch_wall_s"] = (
                        now - t_epoch)
                last_wall_done_t = now
            t_track = time.perf_counter()
            tracker.log(epoch_metrics, step=proc_epoch)
            history.append(dict(epoch_metrics))
            if ht is not None:
                ht["track"] = time.perf_counter() - t_track

            # ---- periodic visualization (fraction-of-epochs interval) ----
            if vis_every and proc_epoch % vis_every == 0 and val_loader is not None:
                try:
                    vb = next(iter(val_loader))
                    va = shard_batch(vb, self.mesh)
                    va = {k: v for k, v in va.items() if isinstance(v, jax.Array)}
                    # under epoch pipelining self.params is the NEXT epoch's
                    # in-flight state; the processed epoch's snapshot is the
                    # correct (and in fact more faithful) params to render
                    vparams = (rec["snap"] if rec is not None
                               and "snap" in rec else self.params)
                    _, vpred = self._eval_step(vparams, va)
                    vpred_np = jax.tree_util.tree_map(np.asarray, vpred)
                    fig_dir = Path(self.full_config.get("saving", {}).get(
                        "saving_dir", ".")) / "figures"
                    fig_dir.mkdir(parents=True, exist_ok=True)
                    self.scheme.visualize(vb, vpred_np,
                                          fig_dir / f"epoch_{proc_epoch:04d}.png")
                except Exception as e:
                    # visualization must never kill training, but a broken
                    # figure pipeline shouldn't be silent either: warn once
                    if not self._warned_visualization:
                        self._warned_visualization = True
                        import warnings
                        warnings.warn(
                            f"periodic visualization failed (epoch {epoch}): "
                            f"{type(e).__name__}: {e} — suppressing further "
                            f"visualization errors this run")

            # ---- early stopping on total val loss (reference :238-263), or
            # on the configured early_stop_metric when present this epoch ----
            if early_stop_metric is not None:
                key = early_stop_metric if early_stop_metric.startswith(prefix) \
                    else f"{prefix}{early_stop_metric}"
                monitor = epoch_metrics.get(key)
            elif val_loader is not None:
                monitor = epoch_total_val   # None on valid_period-skipped epochs
            else:
                monitor = epoch_metrics.get(f"{prefix}train/total_loss", float("inf"))
            stop = False
            t_best = time.perf_counter()
            if monitor is not None:     # None: no early-stop signal (skipped val)
                if monitor < best_val:
                    best_val = monitor
                    # pipelined epochs already hold a pre-donation
                    # snapshot of this epoch's params — reuse it
                    best_params = (rec["snap"] if rec is not None
                                   and "snap" in rec else
                                   jax.tree_util.tree_map(jnp.copy,
                                                          self.params))
                    best_epoch = proc_epoch
                    best_epoch_metrics = dict(epoch_metrics)
                    epochs_without_improvement = 0
                else:
                    epochs_without_improvement += 1
                    stop = epochs_without_improvement > tolerance
            if ht is not None:
                ht["beststop"] = time.perf_counter() - t_best
                t_ckpt = time.perf_counter()

            # checkpoint AFTER the early-stop update, so the saved counters
            # reflect this epoch's decision and resume is state-exact
            if ckpt is not None:
                saved = ckpt.save(proc_epoch, self.params, self.opt_states,
                                  best_params=best_params,
                                  extra={"epoch": proc_epoch, "best_val": best_val,
                                         "best_epoch": best_epoch,
                                         "epochs_without_improvement":
                                             epochs_without_improvement})
                if saved and best_metrics_path is not None:
                    import json as _json
                    best_metrics_path.write_text(
                        _json.dumps(best_epoch_metrics))
            if ht is not None:
                ht["ckpt"] = time.perf_counter() - t_ckpt
                # `total` spans dispatch->processed; under epoch pipelining
                # consecutive totals OVERLAP (epoch k+1 dispatches before k
                # is processed), so the honest steady-state figure is the
                # CADENCE — the diff of consecutive `t_done` stamps
                # (tools/profile_epoch_host.py reports both).
                ht["total"] = time.perf_counter() - t_epoch
                ht["t_done"] = time.perf_counter()
                host_rows.append(ht)
            if stop:
                break

        if profiling:
            jax.profiler.stop_trace()
        if ckpt is not None:
            ckpt.close()   # orbax saves are async; block before process exit
        if best_epoch_metrics:
            tracker.log_best(best_epoch_metrics, step=best_epoch)
        elapsed = time.perf_counter() - t_start

        self.params = best_params
        for name, bundle in models.items():
            bundle.params = best_params[name]

        exp_dict: Dict[str, Any] = {f"{name}_model": bundle
                                    for name, bundle in models.items()}
        exp_dict["best_epoch"] = best_epoch
        exp_dict["best_val_loss"] = best_val
        exp_dict["train_seconds"] = elapsed
        # per-epoch loss histories (the reference's exp_dict loss dicts,
        # joint_registration_strainmat_LMA.py:282-293)
        exp_dict["train_loss_dict"] = {
            k: [h[k] for h in history if k in h]
            for k in (history[-1] if history else {}) if k.endswith("total_loss")
            or "/" in k}
        return exp_dict, tracker

    # ---- inference ----------------------------------------------------------- #
    def test(self, models: Dict[str, Any], datasets: Dict[str, Any],
             trainer_config: Dict[str, Any] | None = None,
             full_config: Dict[str, Any] | None = None, device=None,
             wandb_experiment=None, target_dataset: str = "test",
             tracker: Optional[MetricsTracker] = None,
             ) -> Tuple[List[Dict[str, Any]], Dict[str, float], Optional[MetricsTracker]]:
        cfg = trainer_config or self.trainer_config
        batch_size = int(cfg.get("batch_size", 10))
        # accept either raw bundle dicts or the exp_dict returned by train()
        bundles = {}
        for k, v in models.items():
            if k.endswith("_model"):
                bundles[k[: -len("_model")]] = v
            elif hasattr(v, "module"):
                bundles[k] = v
        ds = datasets[target_dataset]
        loader = self.scheme.make_loader(ds, batch_size, shuffle=False)
        if self._eval_step is None or self.params is None:
            first = next(iter(loader))
            self.setup(bundles, first, steps_per_epoch=max(1, len(loader)),
                       seed=int(cfg.get("seed", 2434)))

        preds: List[Dict[str, Any]] = []
        loss_accum: Dict[str, float] = {}
        step_values: List[Dict[str, Any]] = []
        nb = 0

        def _consume(batch, pred):
            # Host-side download + per-sample unpack. Under eval_pipeline the
            # NEXT batch's eval step is already dispatched when this runs, so
            # the device computes batch k+1 while batch k's predictions cross
            # the host<->device link (same overlap the training loop exploits
            # via epoch_pipeline). Outputs are bit-identical to the
            # synchronous loop: same programs, same inputs, same preds order —
            # only the host read is deferred (tests/test_eval_pipeline.py).
            pred_np = jax.device_get(pred)
            mask = np.asarray(batch["sample_mask"])
            bsz = int(mask.shape[0])
            for i in range(bsz):
                if mask[i] == 0:
                    continue
                sample: Dict[str, Any] = {}
                for k, v in batch.items():
                    if k == "sample_mask":
                        continue
                    sample[k] = v[i] if isinstance(v, np.ndarray) else v[i]
                for k, v in pred_np.items():
                    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == bsz:
                        sample[f"{k}_pred"] = v[i]
                preds.append(sample)

        pipeline = bool(cfg.get("eval_pipeline", True))
        pending: Optional[Tuple[Dict[str, Any], Dict[str, Any]]] = None
        for batch in loader:
            arrays = shard_batch(batch, self.mesh)
            dev = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}
            values, pred = self._eval_step(self.params, dev)
            nb += 1
            step_values.append(values)  # deferred sync (same as train loop)
            if pipeline:
                if pending is not None:
                    _consume(*pending)
                pending = (batch, pred)
            else:
                _consume(batch, pred)
        if pending is not None:
            _consume(*pending)

        for values in jax.device_get(step_values):   # one bulk metric fetch
            for k, v in values.items():
                loss_accum[k] = loss_accum.get(k, 0.0) + float(v)

        perf = self.scheme.performance(preds, target_dataset)
        for k, v in loss_accum.items():
            perf[f"final-{target_dataset}/loss_{k}"] = v / max(1, nb)
        if tracker is not None:
            tracker.log(perf)
        return preds, perf, tracker
