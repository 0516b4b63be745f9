"""Config-driven training loop (reference: audio_train.py:48-213 +
AudioLightningModule, audio_litmodule.py:36-257) — TPU-native:

- one jitted XLA program per train step (fwd+loss+grad+clip+update),
  batch sharded over the 'dp' mesh axis, optional 'tp' weight sharding;
- host-side schedulers mutating injected lr (no recompiles);
- orbax top-3+last checkpointing with optimizer/scheduler state included;
- early stopping (patience on val loss), periodic test-set validation;
- optional speed-perturb augmentation (95/100/105%, re-mixed targets,
  audio_litmodule.py:88-109) done host-side with a static crop length;
- best_model.pth export in the reference schema at the end.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np
from scipy.signal import resample_poly

import jax
import jax.numpy as jnp

from tdanet_tpu import models as model_zoo
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_sisdr, \
    pairwise_neg_snr
from tdanet_tpu.parallel import make_mesh
from tdanet_tpu.system.checkpoint import CheckpointManager, export_torch_pth
from tdanet_tpu.system.optimizers import (
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from tdanet_tpu.system.schedulers import make_scheduler
from tdanet_tpu.system.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from tdanet_tpu.utils import print_only

LOSS_TABLE = {
    "pairwise_neg_snr": pairwise_neg_snr,
    "pairwise_neg_sisdr": pairwise_neg_sisdr,
}


def build_loss(loss_conf):
    def one(side):
        c = loss_conf[side]
        return PITLossWrapper(
            LOSS_TABLE[c["sdr_type"]],
            pit_from=c["config"].get("pit_from", "pw_mtx"),
            threshold_byloss=c["config"].get("threshold_byloss", False))
    return {"train": one("train"), "val": one("val")}


def speed_perturb_batch(targets: np.ndarray, rng: np.random.Generator,
                        speeds=(95, 100, 105)) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """Per-source random resample then re-mix; crop to the static minimum
    length (seg*100/max_speed) so jit shapes stay constant."""
    B, n_src, T = targets.shape
    out_T = (T * 100) // max(speeds)
    new = np.zeros((B, n_src, out_T), np.float32)
    for i in range(n_src):
        speed = int(rng.choice(speeds))
        if speed == 100:
            new[:, i] = targets[:, i, :out_T]
        else:
            res = resample_poly(targets[:, i], 100, speed, axis=-1)
            new[:, i] = res[:, :out_T]
    return new.sum(1), new


class AudioTrainer:
    """End-to-end trainer driven by a reference-shaped config dict."""

    def __init__(self, config: Dict[str, Any], mesh=None):
        self.config = config
        self.exp_dir = config.get("main_args", {}).get("exp_dir") or \
            os.path.join("Experiments", "checkpoint",
                         config["exp"]["exp_name"])
        os.makedirs(self.exp_dir, exist_ok=True)

        # model
        net = config["audionet"]
        sr = config["datamodule"]["data_config"]["sample_rate"]
        net_conf = dict(net["audionet_config"])
        # Training defaults to selective rematerialization of the
        # shared-weight recurrence ("scales": keep each iteration's
        # pyramid/GA/fusion landmarks, recompute only the segments
        # between them): without any remat the full-recipe backward
        # (16 blocks, batch 8, 3 s) needs ~17 GB of activations and
        # OOMs a 16 GB v5e chip. Measured vs full per-iteration remat
        # (scripts/probe_train_remat.py): same step time, ~5x faster
        # compile (74 s vs 395 s), ~2.4 GB extra activations at the
        # recipe shape. Override with audionet_config.remat=true
        # (full) or =false (none). Only injected when the model's ctor
        # takes remat — variants without the knob would otherwise trip
        # the unknown-kwarg warning on every construction.
        cls = model_zoo.get(net["audionet_name"])
        import inspect
        if "remat" in inspect.signature(cls.__init__).parameters:
            net_conf.setdefault("remat", "scales")
        self.model = cls(sample_rate=sr, **net_conf)

        # data
        from tdanet_tpu import datas
        dm_cls = getattr(datas, config["datamodule"]["data_name"])
        self.datamodule = dm_cls(**config["datamodule"]["data_config"])
        self.datamodule.setup()

        # mesh: all local devices data-parallel unless caller provides one
        self.mesh = mesh if mesh is not None else make_mesh(tp=1)
        self.dp = self.mesh.shape["dp"]

        # optimizer + scheduler
        opt_conf = dict(config["optimizer"])
        optim_name = opt_conf.pop("optim_name", "adam")
        self.base_lr = opt_conf.pop("lr", 1e-3)
        grad_clip = config["training"].get("gradient_clip_val", 5.0)
        self.optimizer = make_optimizer(optim_name, lr=self.base_lr,
                                        grad_clip=grad_clip, **opt_conf)
        sche = config.get("scheduler") or {}
        steps_per_epoch = max(1, len(self.datamodule.train_dataloader()))
        self.scheduler = make_scheduler(
            sche.get("sche_name", "none"), self.base_lr,
            steps_per_epoch=steps_per_epoch,
            d_model=net["audionet_config"].get("in_channels", 512),
            **sche.get("sche_config", {})) if sche else None
        self.epoch_scheduler = sche.get("sche_name", "").lower() == \
            "reducelronplateau"

        self.loss = build_loss(config["loss"])
        self.compute_dtype = (
            jnp.bfloat16 if str(config["training"].get("precision", 32))
            in ("16", "bf16", "16-mixed") else None)

        self.train_step = make_train_step(
            self.model, self.loss["train"], self.optimizer, mesh=self.mesh,
            compute_dtype=self.compute_dtype)
        self.eval_step = make_eval_step(self.model, self.loss["val"],
                                        mesh=self.mesh)
        self.ckpt = CheckpointManager(self.exp_dir, top_k=3)
        self.history: list[Dict[str, float]] = []
        # wandb logging, offline-capable and fully optional
        # (reference: audio_train.py:174-181)
        self._wandb = None
        exp = config.get("exp", {})
        # rank-0 only under multi-host, like the file exports in
        # finalize() — every rank init'ing would create N duplicate
        # wandb runs each double-logging the same epoch rows
        if exp.get("project") and not exp.get("disable_wandb") \
                and jax.process_index() == 0:
            try:
                import wandb
                mode = "offline" if exp.get("offline", True) else "online"
                self._wandb = wandb.init(
                    project=exp["project"], name=exp.get("exp_name"),
                    config=config, mode=mode, dir=self.exp_dir)
            except Exception:
                self._wandb = None

    # -- loops -------------------------------------------------------------

    def _device_batch(self, mix, src):
        """Trim the batch to a multiple of dp so shards are even. Under
        multi-host (jax.distributed), every process loads the same
        dataset order (same manifests, same seed), and each contributes
        its process-local slice of the global batch."""
        B = (mix.shape[0] // self.dp) * self.dp
        if B == 0:
            return None, None
        if jax.process_count() == 1:
            return jnp.asarray(mix[:B]), jnp.asarray(src[:B])
        from tdanet_tpu.parallel import batch_sharding
        pc, pi = jax.process_count(), jax.process_index()
        B_loc = B // pc
        bsh = batch_sharding(self.mesh)
        mix = np.asarray(mix[:B], np.float32)
        src = np.asarray(src[:B], np.float32)
        gmix = jax.make_array_from_process_local_data(
            bsh, mix[pi * B_loc:(pi + 1) * B_loc], mix.shape)
        gsrc = jax.make_array_from_process_local_data(
            bsh, src[pi * B_loc:(pi + 1) * B_loc], src.shape)
        return gmix, gsrc

    def _sync_flags(self, *flags: bool) -> tuple:
        """OR-reduce host-side bools across processes. Under multi-host,
        preempt/step-failure decisions MUST be taken by every rank in the
        same batch iteration: a lone rank breaking to ckpt.save (an orbax
        multi-process collective) or restoring alone while peers psum
        deadlocks the pod. Single-process: a no-op."""
        if jax.process_count() == 1:
            return flags
        from jax.experimental import multihost_utils
        got = multihost_utils.process_allgather(
            np.asarray([1 if f else 0 for f in flags], np.int32))
        return tuple(bool(x) for x in np.max(got, axis=0))

    def _restore_or_reinit(self, cfg_t):
        """Roll back to the last checkpoint after a synced step failure
        (fresh init when none has been written yet). Called by every
        rank in the same iteration — restore_last is a collective."""
        try:
            self.state, _ = self.ckpt.restore_last(self.state)
            # roll the host-side scheduler back with the params —
            # exactly like resume — or the lr schedule runs ahead of
            # the restored trajectory (each batch's scheduler.step()
            # would overwrite the checkpointed lr in opt_state)
            if self.scheduler is not None:
                extras = self.ckpt.load_extras()
                if "scheduler" in extras:
                    self.scheduler.load_state_dict(extras["scheduler"])
        except FileNotFoundError:
            self.state = create_train_state(
                self.model, self.optimizer,
                jax.random.PRNGKey(cfg_t.get("seed", 0)),
                mesh=self.mesh)

    def validate(self, loader) -> float:
        """Mean eval loss. Losses stay ON DEVICE until the final mean —
        a float() per batch would serialize eval through one host
        round-trip per step (~30 ms on a tunneled chip)."""
        losses = []
        for mix, src, _ in loader:
            mix, src = self._device_batch(mix, src)
            if mix is None:
                continue
            losses.append(self.eval_step(self.state.params, mix, src))
        if not losses:
            return float("inf")
        return float(jnp.mean(jnp.stack(losses)))

    def fit(self, resume: bool = False):
        cfg_t = self.config["training"]
        epochs = cfg_t.get("epochs", 500)
        patience = cfg_t.get("early_stop", {}).get("patience", 30)
        speed_aug = bool(cfg_t.get("SpeedAug", False))
        # production hardening (no reference counterpart; TPU pods get
        # preempted and tunneled devices wedge):
        #  - SIGTERM/SIGINT -> finish the current step, checkpoint, exit
        #    cleanly (resume picks up at the next epoch);
        #  - a failing train step restores the last checkpoint and
        #    continues, up to max_step_failures per fit().
        max_failures = int(cfg_t.get("max_step_failures", 3))
        self._preempted = False
        import signal

        def _on_term(signum, frame):
            if self._preempted:
                # second signal: the graceful path is stuck (e.g. a step
                # RPC hung on a wedged tunnel) — let the default/raise
                # behavior kill us so supervisors' `timeout`/SIGTERM
                # escalation works (observed wedge, round 3)
                raise KeyboardInterrupt(
                    f"second signal {signum} during preemption shutdown")
            self._preempted = True
        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # non-main thread
                pass

        try:
            return self._fit_body(cfg_t, epochs, patience, speed_aug,
                                  max_failures, resume)
        finally:
            for sig, h in old_handlers.items():
                signal.signal(sig, h)

    def _fit_body(self, cfg_t, epochs, patience, speed_aug, max_failures,
                  resume):
        self.state = create_train_state(
            self.model, self.optimizer, jax.random.PRNGKey(
                cfg_t.get("seed", 0)), mesh=self.mesh)
        start_epoch = 0
        if resume:
            try:
                self.state, step = self.ckpt.restore_last(self.state)
                extras = self.ckpt.load_extras()
                start_epoch = extras.get("epoch", 0) + 1
                if self.scheduler is not None and "scheduler" in extras:
                    self.scheduler.load_state_dict(extras["scheduler"])
                print_only(f"Resumed from step {step}, epoch {start_epoch}")
            except FileNotFoundError:
                print_only("No checkpoint found; training from scratch")

        train_loader = self.datamodule.train_dataloader()
        val_loader = self.datamodule.val_dataloader()
        test_loader = self.datamodule.test_dataloader()
        rng_host = np.random.default_rng(1234)
        best_val, bad_epochs = float("inf"), 0
        failures = 0

        with self.mesh:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                train_losses = []
                for b, (mix, src, _) in enumerate(train_loader):
                    if speed_aug:
                        mix, src = speed_perturb_batch(src, rng_host)
                    mix, src = self._device_batch(mix, src)
                    if mix is None:
                        continue
                    if self.scheduler is not None and \
                            not self.epoch_scheduler:
                        lr = self.scheduler.step()
                        set_learning_rate(self.state.opt_state, lr)
                    rng = jax.random.PRNGKey(
                        (epoch << 20) | (b & 0xFFFFF))
                    step_exc = None
                    try:
                        if max_failures > 0 and train_losses and \
                                not isinstance(train_losses[-1], float):
                            # JAX dispatch is async: device-side failures
                            # in step k usually surface only when its
                            # result materializes. Blocking on the
                            # PREVIOUS step's scalar loss inside this try
                            # keeps one step in flight (dispatch
                            # pipelining intact) while routing the most
                            # common real failure mode (RPC/device errors
                            # on a tunneled chip) into recovery below.
                            train_losses[-1] = float(train_losses[-1])
                        self.state, loss = self.train_step(
                            self.state, mix, src, rng)
                    except (KeyboardInterrupt, SystemExit):
                        raise
                    except Exception as e:
                        step_exc = e
                        print_only(
                            f"train step failed ({type(e).__name__}: "
                            f"{str(e)[:200]})")
                    failed, preempted = self._sync_flags(
                        step_exc is not None, self._preempted)
                    # OR (never assign): a SIGTERM landing between the
                    # _sync_flags read and this line must not be
                    # clobbered by the stale synced value — it gets
                    # picked up at the next batch-boundary sync instead
                    self._preempted = self._preempted or preempted
                    if failed:
                        failures += 1
                        print_only(f"restoring last checkpoint on all "
                                   f"ranks [{failures}/{max_failures}]")
                        if failures > max_failures:
                            raise step_exc if step_exc is not None else \
                                RuntimeError("peer rank train step failed")
                        if step_exc is not None and train_losses and \
                                not isinstance(train_losses[-1], float):
                            # the pending loss may be the poisoned result
                            # whose materialization raised — drop it
                            train_losses.pop()
                        self._restore_or_reinit(cfg_t)
                        continue
                    train_losses.append(loss)
                    if preempted:
                        # break on the SYNCED flag only: a signal that
                        # arrived after the sync must not make this rank
                        # break alone while peers enter the next step's
                        # collectives (pod deadlock)
                        break
                if max_failures > 0 and train_losses and \
                        not isinstance(train_losses[-1], float):
                    # surface an async failure from the epoch's final step
                    # here (inside recovery) rather than at the mean below
                    tail_exc = None
                    try:
                        train_losses[-1] = float(train_losses[-1])
                    except (KeyboardInterrupt, SystemExit):
                        raise
                    except Exception as e:
                        tail_exc = e
                        print_only(
                            f"epoch-final train step failed "
                            f"({type(e).__name__}: {str(e)[:200]})")
                        train_losses.pop()
                    (failed,) = self._sync_flags(tail_exc is not None)
                    if failed:
                        failures += 1
                        if failures > max_failures:
                            raise tail_exc if tail_exc is not None else \
                                RuntimeError("peer rank train step failed")
                        self._restore_or_reinit(cfg_t)
                train_loss = float(jnp.mean(jnp.stack(train_losses))) \
                    if train_losses else float("nan")

                # epoch-end preemption + empty-epoch decisions, in ONE
                # synchronized exchange: validate and ckpt.save below
                # are collectives, so a signal that arrived on one rank
                # after the last batch-boundary sync — or a train_losses
                # list that the poisoned-loss pops emptied on ONE rank
                # only — must put EVERY rank on the same branch here
                epoch_preempted, any_rank_empty = self._sync_flags(
                    self._preempted, not train_losses)
                self._preempted = self._preempted or epoch_preempted
                if any_rank_empty and not epoch_preempted:
                    if failures:
                        raise RuntimeError(
                            f"every train step this epoch failed "
                            f"({failures} failure(s) recovered; see the "
                            f"errors above)")
                    raise RuntimeError(
                        f"every training batch was dropped: batch size "
                        f"must be >= dp ({self.dp}); raise "
                        f"datamodule.data_config.batch_size or shrink "
                        f"the mesh")
                if epoch_preempted:
                    # skip validation: preemption grace windows are short.
                    # val_loss=inf keeps this save out of the top-k set
                    # while still updating the 'last' checkpoint.
                    extras = {"epoch": epoch, "val_loss": float("inf")}
                    if self.scheduler is not None:
                        extras["scheduler"] = self.scheduler.state_dict()
                    self.ckpt.save(epoch, self.state, float("inf"), extras)
                    print_only(f"Preempted: checkpointed epoch {epoch}, "
                               f"exiting cleanly (resume to continue)")
                    break

                val_loss = self.validate(val_loader)
                row = {"epoch": epoch, "train_loss": train_loss,
                       "val_loss": val_loss,
                       "lr": float(get_learning_rate(self.state.opt_state)),
                       "time_s": time.time() - t0}
                if (epoch + 1) % 10 == 0 and test_loader is not None:
                    row["test_loss"] = self.validate(test_loader)
                self.history.append(row)
                print_only(json.dumps(row))
                if self._wandb is not None:
                    self._wandb.log(row, step=epoch)

                if self.scheduler is not None and self.epoch_scheduler:
                    lr = self.scheduler.step(val_loss)
                    set_learning_rate(self.state.opt_state, lr)

                extras = {"epoch": epoch, "val_loss": val_loss}
                if self.scheduler is not None:
                    extras["scheduler"] = self.scheduler.state_dict()
                self.ckpt.save(epoch, self.state, val_loss, extras)

                if val_loss < best_val:
                    best_val, bad_epochs = val_loss, 0
                else:
                    bad_epochs += 1
                    # >= : stop after exactly `patience` consecutive
                    # non-improving val epochs, matching Lightning's
                    # EarlyStopping wait_count semantics
                    # (audio_train.py:156-158)
                    if bad_epochs >= patience:
                        print_only(f"Early stopping at epoch {epoch}")
                        break

        self.ckpt.wait()
        self.finalize()
        return self.history

    def finalize(self):
        """Reload the best checkpoint and export best_model.pth
        (audio_train.py:204-213)."""
        try:
            best_state, best_step = self.ckpt.restore_best(self.state)
        except Exception:
            best_state, best_step = self.state, -1
        if jax.process_index() != 0:
            return  # restore participates on all ranks; files are rank-0
        with open(os.path.join(self.exp_dir, "history.json"), "w") as f:
            json.dump(self.history, f, indent=2)
        with open(os.path.join(self.exp_dir, "best_k_models.json"),
                  "w") as f:
            json.dump({"best_step": best_step,
                       "kept_steps": self.ckpt.all_best_steps()}, f)
        params = jax.device_get(best_state.params)
        export_torch_pth(self.model, params,
                         os.path.join(self.exp_dir, "best_model.pth"))
        print_only(f"Exported best_model.pth (step {best_step}) "
                   f"to {self.exp_dir}")
