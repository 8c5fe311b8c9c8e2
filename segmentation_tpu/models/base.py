"""Core model runtime — the BaseModel replacement.

Public API parity with reference models/basemodel.py: ``train_step()``,
``test()``, ``infer(imgs)``, ``snapshot()``, plus ``restore`` semantics
(load_snapshot / load_snapshot_from / INFERENCE-mode forced restore,
reference models/basemodel.py:53-55, 112-136) and summary writing.

TPU-native design: the entire step — forward, losses, adversary, both
optimizers, metric computation — is ONE jit-compiled function over a sharded
train state (no per-step Python graph work, no summary recomputation; fixes
the reference's summary-rerun wart at models/basemodel.py:465-473). Batches
are placed batch-sharded over the mesh's 'data' axis; XLA inserts the
gradient psums. Params/opt state are replicated (these models are far below
HBM capacity — SURVEY §2.10 records the no-TP/PP decision).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from segmentation_tpu.core import mesh as mesh_lib
from segmentation_tpu.core.config import ModelConfig, TrainConfig
from segmentation_tpu.core.precision import policy_from_config
from segmentation_tpu.nn import module as hk
from segmentation_tpu.nn.shapes import center_crop_or_pad
from segmentation_tpu.training import losses
from segmentation_tpu.training.adversarial import (
    LucAdversary,
    prep_adversary_inputs,
)
from segmentation_tpu.utils import checkpoint as ckpt_lib
from segmentation_tpu.utils.summary import SummaryWriter


class TrainState(NamedTuple):
    """The full training state — a single pytree, donated every step."""

    step: jnp.ndarray
    rng: jnp.ndarray
    params: Dict[str, Any]
    model_state: Dict[str, Any]
    opt_state: Any
    adv_params: Dict[str, Any]
    adv_model_state: Dict[str, Any]
    adv_opt_state: Any
    extra_opt_state: Any = ()


def _tree_sg(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


class Trainer:
    """Shared machinery: state, jit compilation, checkpointing, summaries."""

    model_name = "model"

    def __init__(
        self,
        model,
        dataset=None,
        test_dataset=None,
        model_cfg: Optional[ModelConfig] = None,
        train_cfg: Optional[TrainConfig] = None,
        mesh=None,
    ):
        self.model = model
        self.dataset = dataset
        self.test_dataset = test_dataset
        self.mcfg = model_cfg or ModelConfig()
        self.tcfg = train_cfg or TrainConfig()
        self.mode = self.tcfg.mode
        self.policy = policy_from_config(self.tcfg)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.model_name = getattr(model, "model_name", self.model_name)

        self.batch_size = (
            dataset.batch_size if dataset is not None else None
        )

        self.summary = SummaryWriter(
            self.tcfg.log_dir, self.tcfg.summary_iter
        )
        self.save_dir = self.tcfg.save_dir
        self._timings = []
        self._scanned_steps: Dict[int, Any] = {}

        # INFERENCE mode forces restore (reference models/basemodel.py:53-55)
        self.load_snapshot = bool(self.tcfg.load_snapshot) or (
            self.mode == "INFERENCE"
        )

        self._build()
        self._init_state()
        self._init_saver()

    # ---- to be provided by subclasses -------------------------------------
    def _build(self):
        raise NotImplementedError

    def _init_state(self):
        raise NotImplementedError

    # ---- checkpointing (reference models/basemodel.py:112-136) ------------
    def _init_saver(self):
        os.makedirs(self.save_dir, exist_ok=True)
        if not self.load_snapshot:
            return
        try:
            if self.tcfg.load_snapshot_from:
                restored, step = ckpt_lib.restore(
                    self.tcfg.load_snapshot_from, self.state
                )
            else:
                result = ckpt_lib.restore_latest(
                    self.save_dir, self.model_name, self.state
                )
                if result is None:
                    raise FileNotFoundError(
                        f"no checkpoint in {self.save_dir}"
                    )
                restored, step = result
            self.state = jax.device_put(restored, mesh_lib.replicated(self.mesh))
            print(f"Restored snapshot; resuming from global step {step}")
        except Exception as e:
            # Resume-if-present training falls through to fresh weights (the
            # reference contract). But INFERENCE forces restore, and an
            # explicit load_snapshot_from is an unambiguous ask — silently
            # serving random weights there is a correctness trap: hard-fail.
            if self.mode == "INFERENCE" or self.tcfg.load_snapshot_from:
                raise RuntimeError(
                    f"snapshot restore required (mode={self.mode}, "
                    f"load_snapshot_from={self.tcfg.load_snapshot_from!r}) "
                    f"but failed: {e}"
                ) from e
            print(f"Failed to load snapshot ({e}); proceed with training")

    def snapshot(self) -> Optional[str]:
        if self.mode == "INFERENCE":
            print("snapshot() with INFERENCE mode invalid")
            return None
        step = int(jax.device_get(self.state.step))
        path = ckpt_lib.save(
            self.save_dir,
            self.model_name,
            step,
            self.state,
            max_to_keep=self.tcfg.max_to_keep,
        )
        print(f"Global step {step}, snapshotted to {path}")
        return path

    @property
    def global_step(self) -> int:
        return int(jax.device_get(self.state.step))

    # ---- common helpers ---------------------------------------------------
    def _place_batch(self, batch):
        return mesh_lib.shard_batch(self.mesh, batch)

    def _replicate(self, tree):
        return jax.device_put(tree, mesh_lib.replicated(self.mesh))

    def write_summary(self, values, step=None):
        """Public summary hook (reference models/basemodel.py:465-473 API);
        values is a dict of scalars — no graph recomputation happens."""
        self.summary.scalars(
            self.global_step if step is None else step, values, force=True
        )

    def close(self):
        self.summary.close()


class SegmentationTrainer(Trainer):
    """Trainer for the segmentation zoo (U-Net, FCN, Deconv) and for
    autoencoder-mode models. Handles: xentropy or MSE objective
    (reference models/basemodel.py:59-70), IN_OUT_CROP label alignment
    (:412-417, models/unet.py:171-174), optional Luc adversarial mode
    (:323-354), BN state, and the Kendall&Gal MC-dropout inference loop."""

    def __init__(self, *args, adversary=None, **kwargs):
        self._adversary_net = adversary
        super().__init__(*args, **kwargs)

    # ------------------------------------------------------------------ build
    def _build(self):
        mcfg, tcfg = self.mcfg, self.tcfg
        model = self.model
        self.autoencoder = bool(mcfg.autoencoder)
        self.adversarial = bool(mcfg.adversarial_training)
        self.variational = bool(mcfg.variational) and self.autoencoder
        self.xent_alpha = 1.5  # reference models/autoencoder.py:89
        self.in_out_crop = bool(getattr(model, "IN_OUT_CROP", False))
        self.in_out_ratio = bool(getattr(model, "IN_OUT_RATIO", False))

        self._fwd = hk.transform(lambda x: model(x))
        if tcfg.remat:
            # Rematerialized apply for the training path (activations
            # recomputed in backward; jax.checkpoint over the whole model).
            orig_apply = self._fwd.apply
            remat_apply = jax.checkpoint(
                lambda params, st, rng, x: orig_apply(
                    params, st, rng, x, train=True
                ),
            )
            self._fwd = self._fwd._replace(
                apply=lambda params, st, rng, x, train=False: (
                    remat_apply(params, st, rng, x)
                    if train
                    else orig_apply(params, st, rng, x, train=False)
                )
            )
        if self.adversarial and self._adversary_net is None:
            self._adversary_net = LucAdversary()
        if self.adversarial:
            self._adv_fwd = hk.transform(lambda x: self._adversary_net(x))

        self.optimizer = optax.adam(tcfg.learning_rate, b1=tcfg.adam_beta1)
        if self.adversarial:
            self.adv_optimizer = optax.adam(
                tcfg.adversarial_lr, b1=tcfg.adam_beta1
            )
        if self.variational and self.adversarial:
            # Split-out KLD optimizer (reference models/autoencoder.py:143-146)
            self.kld_optimizer = optax.adam(1e-5)

        # ---- the jitted step ---------------------------------------------
        def align_target(y, logits):
            """Shape-contract alignment (reference models/basemodel.py:
            412-417): IN_OUT_CROP center-crops labels to the logits' size
            (models/unet.py:171-174); IN_OUT_RATIO nearest-resizes them
            (class maps must not be interpolated)."""
            if y.shape[1] == logits.shape[1] and y.shape[2] == logits.shape[2]:
                return y
            if y.ndim == 3:
                y = y[..., None]
            if self.in_out_crop:
                y = center_crop_or_pad(y, logits.shape[1], logits.shape[2])
            elif self.in_out_ratio:
                y = jax.image.resize(
                    y, (y.shape[0], logits.shape[1], logits.shape[2],
                        y.shape[3]),
                    method="nearest",
                )
            return y

        def to_compute(img):
            """Images arrive float (already /255-normalized by the loader)
            or as raw uint8 staging batches (data.native uint8_images=True:
            4× less host→device transfer) — normalize the latter on device,
            fused into the step."""
            dt = self.policy.compute_dtype
            if img.dtype == jnp.uint8:
                return img.astype(dt) * (1.0 / 255.0)
            return img.astype(dt)

        self._to_compute = to_compute

        def loss_fn(params, adv_params, model_state, adv_model_state, rng, batch, train):
            x = to_compute(batch["image"])
            k_model, k_adv = jax.random.split(rng)
            out, new_ms = self._fwd.apply(
                params, model_state, k_model, x, train=train
            )
            logits, aux = out if isinstance(out, tuple) else (out, {})
            metrics = {}
            if self.autoencoder:
                target = align_target(x, logits)
                xent = losses.mse(logits, target)
            else:
                target = align_target(batch["mask"], logits)
                xent = losses.segmentation_xentropy(
                    logits, target, mcfg.n_classes
                )
            metrics["seg_xentropy"] = xent

            new_adv_ms = adv_model_state
            if self.adversarial:
                if self.autoencoder:
                    # Adversarial autoencoder: adversary scores real images
                    # vs reconstructions (reference models/autoencoder.py:49
                    # routes through BaseModel's adversary with y = x).
                    real_in, fake_in = target, logits
                else:
                    real_in, fake_in = prep_adversary_inputs(
                        logits, target, mcfg.n_classes
                    )
                # Branch 1: adversary params frozen; grads flow into the
                # segmentation net through softmax(logits).
                fake_for_seg, _ = self._adv_fwd.apply(
                    _tree_sg(adv_params), adv_model_state, k_adv,
                    fake_in, train=train,
                )
                # Branches 2+3: adversary trains on real vs sg(fake).
                real_logits, adv_ms1 = self._adv_fwd.apply(
                    adv_params, adv_model_state, k_adv, real_in, train=train
                )
                fake_for_adv, new_adv_ms = self._adv_fwd.apply(
                    adv_params, adv_ms1, k_adv,
                    jax.lax.stop_gradient(fake_in), train=train,
                )
                l_real, l_fake, l_fake_one = losses.luc_adversarial_losses(
                    real_logits, fake_for_adv
                )
                _, _, l_fake_one_seg = losses.luc_adversarial_losses(
                    real_logits, fake_for_seg
                )
                # seg loss: xent + λ·CE(adv(ŷ)→real)   (basemodel.py:334);
                # variational mode scales xent by α (autoencoder.py:138-141)
                alpha = self.xent_alpha if self.variational else 1.0
                seg_loss = jnp.mean(
                    alpha * xent + tcfg.adv_lambda * l_fake_one_seg
                )
                # adv loss: CE(real→1) + CE(fake→0)    (basemodel.py:337)
                adv_loss = jnp.mean(l_real + l_fake)
                total = seg_loss + adv_loss
                metrics.update(
                    seg_loss=seg_loss,
                    adv_loss=adv_loss,
                    l_bce_real=jnp.mean(l_real),
                    l_bce_fake=jnp.mean(l_fake),
                    l_bce_fake_one=jnp.mean(l_fake_one),
                    # combined objective as logged by the reference (:347)
                    loss=jnp.mean(
                        xent
                        - tcfg.adv_lambda * (l_real + l_fake)
                    ),
                )
            else:
                seg_loss = xent
                total = seg_loss
                metrics["seg_loss"] = seg_loss

            if self.variational:
                kld = losses.vae_kld(aux["mu"], aux["logvar"])
                metrics["KLD"] = jnp.mean(kld)
                if not self.adversarial:
                    # reference models/autoencoder.py:148
                    total = total + jnp.mean(kld)
                # adversarial case: KLD trains through its own optimizer
                # (see train_step); stop-gradiented out of the seg loss
                # (reference models/autoencoder.py:137-146)

            return total, (new_ms, new_adv_ms, metrics, logits)

        def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
            rng, step_rng = jax.random.split(state.rng)
            grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            k_acc = int(getattr(tcfg, "grad_accum", 1) or 1)
            if k_acc > 1:
                # Gradient accumulation: scan over k microbatches, mean
                # the grads/metrics, ONE optimizer update. Peak activation
                # memory = one microbatch's — the path past the per-chip
                # memory wall (512²: B=192 trains as 2×96). BN state
                # threads through the scan (≡ k sequential B/k steps).
                def _split(v):
                    assert v.shape[0] % k_acc == 0, (
                        f"batch {v.shape[0]} not divisible by "
                        f"grad_accum={k_acc}"
                    )
                    return v.reshape(
                        k_acc, v.shape[0] // k_acc, *v.shape[1:]
                    )

                micro = jax.tree_util.tree_map(_split, batch)
                rngs = jax.random.split(step_rng, k_acc)

                def body(carry, xs):
                    ms, adv_ms = carry
                    b_i, r_i = xs
                    (_, (ms, adv_ms, m, _)), (g, g_adv) = grad_fn(
                        state.params, state.adv_params, ms, adv_ms,
                        r_i, b_i, True,
                    )
                    return (ms, adv_ms), (g, g_adv, m)

                (new_ms, new_adv_ms), (gs, gas, ms_seq) = jax.lax.scan(
                    body,
                    (state.model_state, state.adv_model_state),
                    (micro, rngs),
                )
                g, g_adv, metrics = jax.tree_util.tree_map(
                    lambda v: v.mean(0), (gs, gas, ms_seq)
                )
            else:
                (_, (new_ms, new_adv_ms, metrics, _)), (g, g_adv) = grad_fn(
                    state.params,
                    state.adv_params,
                    state.model_state,
                    state.adv_model_state,
                    step_rng,
                    batch,
                    True,
                )
            updates, opt_state = self.optimizer.update(
                g, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            if self.adversarial:
                adv_updates, adv_opt_state = self.adv_optimizer.update(
                    g_adv, state.adv_opt_state, state.adv_params
                )
                adv_params = optax.apply_updates(state.adv_params, adv_updates)
                k_every = int(
                    getattr(tcfg, "adversarial_update_every", 1) or 1
                )
                if k_every > 1:
                    # Step the adversary only every k-th optimizer step
                    # (reference models/basemodel.py:353-355 keeps the
                    # adversary's train op out of the main train list for
                    # exactly this). lax.cond inside the jitted step: the
                    # skipped branch keeps params AND optimizer state, so
                    # Adam moments don't advance on skipped steps.
                    adv_params, adv_opt_state = jax.lax.cond(
                        state.step % k_every == 0,
                        lambda: (adv_params, adv_opt_state),
                        lambda: (state.adv_params, state.adv_opt_state),
                    )
            else:
                adv_params, adv_opt_state = (
                    state.adv_params,
                    state.adv_opt_state,
                )

            extra_opt_state = state.extra_opt_state
            if self.variational and self.adversarial:
                # Separate low-LR Adam on the KLD objective (reference
                # models/autoencoder.py:143-146). Second backward pass; the
                # forward is CSE'd with the main loss's by XLA.
                def kld_only(p):
                    out, _ = self._fwd.apply(
                        p, state.model_state, step_rng,
                        to_compute(batch["image"]),
                        train=True,
                    )
                    _, aux = out
                    return jnp.mean(losses.vae_kld(aux["mu"], aux["logvar"]))

                g_kld = jax.grad(kld_only)(params)
                kld_updates, extra_opt_state = self.kld_optimizer.update(
                    g_kld, state.extra_opt_state, params
                )
                params = optax.apply_updates(params, kld_updates)

            new_state = TrainState(
                step=state.step + 1,
                rng=rng,
                params=params,
                model_state=new_ms,
                opt_state=opt_state,
                adv_params=adv_params,
                adv_model_state=new_adv_ms,
                adv_opt_state=adv_opt_state,
                extra_opt_state=extra_opt_state,
            )
            return new_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=0)

        def eval_step(state: TrainState, batch):
            total, (_, _, metrics, logits) = loss_fn(
                state.params,
                state.adv_params,
                state.model_state,
                state.adv_model_state,
                state.rng,
                batch,
                False,
            )
            out = {"test_loss": metrics["seg_xentropy"]}
            if not self.autoencoder:
                pred = jnp.argmax(logits, axis=-1)
                target = batch["mask"]
                target = align_target(target, logits)
                if target.ndim == 4:
                    target = target[..., 0]
                out["miou"] = losses.miou(pred, target, mcfg.n_classes)
                out["pixel_acc"] = losses.pixel_accuracy(pred, target)
            return out, logits

        self._eval_step = jax.jit(eval_step)

        def infer_fn(params, model_state, rng, x):
            """inference_ops = [sigmoid(ŷ), argmax map] (reference
            models/unet.py:75-79)."""
            out, _ = self._fwd.apply(
                params, model_state, rng, x.astype(self.policy.compute_dtype),
                train=False,
            )
            logits = out[0] if isinstance(out, tuple) else out
            y_hat_sig = jax.nn.sigmoid(logits.astype(jnp.float32))
            output = jnp.argmax(y_hat_sig, axis=3)[..., None].astype(
                jnp.float32
            )
            return y_hat_sig, output

        self._infer = jax.jit(infer_fn)

        def infer_mc_fn(params, model_state, rng, x, n_samples: int,
                        samples_per_pass: int):
            """Kendall & Gal MC-dropout: n stochastic forward passes →
            per-pixel mean and variance (the reference left the loop to the
            caller, examples/inference.py; here it is one compiled program).
            ``samples_per_pass`` batches MC samples along the batch axis
            (training.bayesian.mc_sample) — iid-identical, MXU-fed."""
            from segmentation_tpu.training.bayesian import mc_sample

            def apply_fn(p, ms, k, xx, train):
                return self._fwd.apply(
                    p, ms, k, xx.astype(self.policy.compute_dtype),
                    train=train,
                )

            # Cast BEFORE mc_sample tiles sp copies along the batch axis:
            # tiling an f32 input and casting inside apply would hold sp×
            # the f32 input in HBM instead of sp× the bf16 cast.
            x = x.astype(self.policy.compute_dtype)
            samples = mc_sample(
                apply_fn, params, model_state, rng, x, n_samples,
                samples_per_pass,
            )  # [S, N, H, W, C]
            mean = jnp.mean(samples, axis=0)
            var = jnp.var(samples, axis=0)
            output = jnp.argmax(mean, axis=3)[..., None].astype(jnp.float32)
            return mean, var, output

        self._infer_mc = jax.jit(infer_mc_fn, static_argnums=(4, 5))

    # ------------------------------------------------------------------ state
    def _init_state(self):
        mcfg = self.mcfg
        rng = jax.random.PRNGKey(self.tcfg.seed)
        init_rng, adv_rng, state_rng = jax.random.split(rng, 3)
        h, w = mcfg.hw
        bs = self.batch_size or 1
        x0 = jnp.zeros(
            (bs, h, w, mcfg.input_channel), self.policy.compute_dtype
        )
        params, model_state = self._fwd.init(init_rng, x0, train=True)
        opt_state = self.optimizer.init(params)

        if self.adversarial:
            out, _ = self._fwd.apply(
                params, model_state, adv_rng, x0, train=False
            )
            logits = out[0] if isinstance(out, tuple) else out
            if self.autoencoder:
                # AAE adversary sees reconstructions [N, H, W, C_in]
                adv_in = jnp.zeros(logits.shape, self.policy.compute_dtype)
            else:
                # Luc adversary sees [N, out_h, out_w, C] one-hot/softmax maps
                adv_in = jnp.zeros(
                    logits.shape[:3] + (mcfg.n_classes,),
                    self.policy.compute_dtype,
                )
            adv_params, adv_ms = self._adv_fwd.init(
                adv_rng, adv_in, train=True
            )
            adv_opt_state = self.adv_optimizer.init(adv_params)
        else:
            adv_params, adv_ms, adv_opt_state = {}, {}, ()

        extra_opt_state = (
            self.kld_optimizer.init(params)
            if (self.variational and self.adversarial)
            else ()
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            adv_params=adv_params,
            adv_model_state=adv_ms,
            adv_opt_state=adv_opt_state,
            extra_opt_state=extra_opt_state,
        )
        self.state = self._replicate(state)
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        print(f"{self.model_name}: {n_params:,} parameters")

    # ------------------------------------------------------------------ steps
    def train_step(self, batch=None) -> Dict[str, float]:
        """One optimizer step. ``batch``: optional pre-placed batch dict
        (device arrays, e.g. from assemble_global_batch on a pod slice);
        default fetches from the trainer's dataset."""
        t0 = time.perf_counter()
        if batch is None:
            batch = self._next_batch(self.dataset)
        self.state, metrics = self._train_step(self.state, batch)
        step = self.global_step  # device sync point
        metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
        dt = time.perf_counter() - t0
        self._timings.append(dt)
        self.summary.scalars(step, {**metrics, "step_time_s": dt})
        return metrics

    def train_steps(self, n: int) -> Dict[str, float]:
        """Run ``n`` optimizer steps in ONE device dispatch: batches are
        fetched, stacked along a leading axis, and consumed by a
        ``lax.scan`` over the same jitted step. For small models/hosts with
        high dispatch latency this amortizes the per-step round trip (~10×
        on the MNIST configs); for big models it simply behaves like ``n``
        fused steps. Returns the LAST step's metrics; the summary stream
        receives one row PER optimizer step (same granularity as the
        train_step loop — loss curves are comparable across
        --steps-per-dispatch settings).

        Each distinct ``n`` compiles its own scanned program — use one
        window size per training loop.
        """
        t0 = time.perf_counter()
        batches = [self._next_batch(self.dataset) for _ in range(n)]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches
        )
        scanned = self._scanned_steps.get(n)
        if scanned is None:
            base_step = self._train_step

            @functools.partial(jax.jit, donate_argnums=0)
            def run(state, stacked):
                def body(st, batch):
                    st, metrics = base_step(st, batch)
                    return st, metrics

                return jax.lax.scan(body, state, stacked)

            scanned = self._scanned_steps[n] = run
        self.state, metric_seq = scanned(self.state, stacked)
        step = self.global_step  # device sync point
        seq = {k: np.asarray(jax.device_get(v))
               for k, v in metric_seq.items()}
        metrics = {k: float(v[-1]) for k, v in seq.items()}
        dt = time.perf_counter() - t0
        self._timings.append(dt)
        # Per-step rows into the summary stream: loss curves keep the same
        # granularity whether the loop runs train_step or train_steps
        # (the writer's summary_iter cadence does the rate limiting).
        per_step = dt / max(1, n)
        for j in range(n):
            self.summary.scalars(
                step - n + 1 + j,
                {**{k: float(v[j]) for k, v in seq.items()},
                 "step_time_s": per_step},
            )
        return metrics

    def test(self) -> Dict[str, float]:
        if self.mode == "INFERENCE":
            print("test() with INFERENCE mode invalid")
            return {}
        ds = self.test_dataset or self.dataset
        batch = self._next_batch(ds)
        out, logits = self._eval_step(self.state, batch)
        step = self.global_step
        out = {k: float(jax.device_get(v)) for k, v in out.items()}
        print(f"TEST step {step}: {out}")
        self.summary.scalars(step, out, force=True)
        # Image panels (reference models/basemodel.py:424-426)
        probs = jax.device_get(jax.nn.sigmoid(logits.astype(jnp.float32)))
        ximg = np.asarray(jax.device_get(batch["image"]))
        if ximg.dtype == np.uint8:  # uint8 staging batches
            ximg = ximg.astype(np.float32) / 255.0
        self.summary.images(step, "test_x", ximg)
        self.summary.images(
            step, "test_out", np.argmax(probs, -1)[..., None] / max(
                1, self.mcfg.n_classes - 1
            ),
        )
        # Ground-truth mask panel. The reference DECLARES a y panel but
        # comments it out of the merged summary (models/basemodel.py:424-436);
        # we ship it live — seeing the mask beside the prediction is the
        # entire point of the panel.
        if "mask" in batch:
            yimg = np.asarray(jax.device_get(batch["mask"]))
            self.summary.images(
                step, "test_y",
                yimg.astype(np.float32) / max(1, self.mcfg.n_classes - 1),
            )
        return out

    def infer(self, imgs: np.ndarray):
        """4-D numpy array in → [y_hat_sig, output] numpy out (reference
        models/basemodel.py:527-531)."""
        x = jnp.asarray(imgs)
        rng = jax.random.PRNGKey(0)
        y_hat_sig, output = self._infer(
            self.state.params, self.state.model_state, rng, x
        )
        return [np.asarray(y_hat_sig), np.asarray(output)]

    def infer_bayesian(self, imgs: np.ndarray, n_samples: int = 16,
                       seed: int = 0, samples_per_pass: int = 1,
                       fast: str = "auto"):
        """MC-dropout uncertainty: returns (mean, variance, argmax-map).
        ``samples_per_pass > 1`` rides that many MC samples on the batch
        axis per forward (must divide n_samples) — same estimator, fewer
        underutilized dispatches; raise it until activation memory says
        stop (4 measured best for B=2 1024² tiles on one v5e: 15.7 vs
        14.1 tiles/s serial).

        ``fast``: 'auto' routes U-Net-family MC through the packed
        serving layout (models/unet_fast apply(mc_keys=...), same
        posterior estimator — masks are iid per activation element);
        'off' forces the standard hk path."""
        sp = max(1, min(int(samples_per_pass), int(n_samples)))
        if n_samples % sp:
            raise ValueError(
                f"--mc-samples ({n_samples}) must be divisible by "
                f"--mc-samples-per-pass ({sp})"
            )
        if fast != "off":
            out = self._fast_mc(imgs, int(n_samples), int(seed), sp)
            if out is not None:
                return out
        x = jnp.asarray(imgs)
        mean, var, output = self._infer_mc(
            self.state.params,
            self.state.model_state,
            jax.random.PRNGKey(seed),
            x,
            n_samples,
            sp,
        )
        return np.asarray(mean), np.asarray(var), np.asarray(output)

    def _fast_mc(self, imgs, n_samples: int, seed: int, sp: int):
        """Fast-layout MC-dropout (VERDICT r3 #6): UNetS2DInference with
        explicit dropout keys at the two Kendall&Gal sites. Returns None
        when the model/geometry doesn't support the packed path (caller
        falls back to the standard compiled MC loop)."""
        from segmentation_tpu.models.unet import UNet
        from segmentation_tpu.models.unet_fast import (
            UNetS2D,
            UNetS2DInference,
        )

        mcfg = self.mcfg
        h, w = int(imgs.shape[1]), int(imgs.shape[2])
        if (
            not mcfg.bayesian
            or not isinstance(self.model, (UNet, UNetS2D))
            or not (0.0 < float(mcfg.dropout_rate) < 1.0)
            or h % 2 or w % 2 or min(h, w) < 192
            # 1024²-class tiles: the packed MC graph compiles ONLY for
            # small per-pass bodies — B=2/sp=1 compiles and measures
            # 17.88 tiles/s (parity with the standard path), while the
            # batch-tiled B·sp ≥ 8 body deterministically crashes the
            # AOT compile helper (HTTP 500, exit 1 — benchmarks/
            # mc1024_probe.py formulation ladder, round 5). Decline the
            # uncompilable shapes; the standard path serves them
            # (VERDICT r4 item 2: never default to an unmeasured path).
            or (h * w > 640 * 640 and int(imgs.shape[0]) * sp > 4)
        ):
            return None
        key = (imgs.shape, n_samples, sp, int(self.state.step))
        cached = getattr(self, "_mc_fast_cache", None)
        if cached is None or cached[0] != key:
            fastm = UNetS2DInference(mcfg)
            params = jax.device_get(self.state.params)
            prepared = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                fastm.prepare(params),
            )

            def mc(xx, k):
                from segmentation_tpu.training.bayesian import (
                    mc_sample_fast,
                )

                samples = mc_sample_fast(
                    fastm, prepared, k, xx, n_samples, sp
                )
                mean = jnp.mean(samples, axis=0)
                var = jnp.var(samples, axis=0)
                out = jnp.argmax(mean, axis=3)[..., None].astype(
                    jnp.float32
                )
                return mean, var, out

            self._mc_fast_cache = (key, jax.jit(mc))
        mean, var, output = self._mc_fast_cache[1](
            jnp.asarray(imgs, jnp.bfloat16), jax.random.PRNGKey(seed)
        )
        return np.asarray(mean), np.asarray(var), np.asarray(output)

    def _next_batch(self, ds):
        batch = ds.get_batch()
        if isinstance(batch, tuple):
            batch = (
                {"image": batch[0], "mask": batch[1]}
                if len(batch) > 1 and batch[1] is not None
                else {"image": batch[0]}
            )
        elif not isinstance(batch, dict):
            batch = {"image": batch}
        return self._place_batch(batch)
