"""Trainers: SFT (`CSMTrainer`), DPO, KTO — capability parity with
`/root/reference/csm_mlx/finetune/trainer.py`, rebuilt on jax/optax:

- one `jax.jit` train step per batch-shape bucket closing over
  `value_and_grad(compute_loss)` + optax update + global-norm clip
  (reference: mx.compile + nn.value_and_grad + clip_grad_norm,
  trainer.py:329-377);
- `TrainerState`/`History`/`TrainingRecord` with the same
  `trainer_state.json` schema and mid-epoch resume arithmetic
  (trainer.py:46-74, :388-424);
- `CheckpointManager` writing `latest.safetensors`,
  `optimizer_state.safetensors`, `trainer_state.json` to both `step_N/` and
  the run root, with auto-resume on load (trainer.py:77-173);
- gradient checkpointing via jax.checkpoint (remat) on every layer (the
  reference only remats layer 0, trainer.py:195-197 — remat here is a
  strict superset);
- optional data parallelism: pass a Mesh and the step shards the batch over
  the "data" axis with params replicated — XLA inserts the gradient
  all-reduce (new capability; the reference is single-device, SURVEY §2.3).

Trainable-parameter masking (LoRA) is handled by an optax.masked wrapper
built from `trainable` path predicates (see finetune/lora.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from csm_mlx_tpu.finetune.dataset import (
    CSMDataset,
    CSMPairwiseDataset,
    CSMPointwiseDataset,
)
from csm_mlx_tpu.finetune.loss import compute_loss
from csm_mlx_tpu.loaders import save_csm_weights, tree_to_flat
from csm_mlx_tpu.models.csm import CSM


# ---------------------------------------------------------------------------
# Args / state / history (schema parity with trainer.py:20-74)
# ---------------------------------------------------------------------------


@dataclass
class TrainArgs:
    model: CSM
    optimizer: optax.GradientTransformation
    output_dir: Path
    first_codebook_weight_multiplier: float = 1.0
    max_norm: float = 1.0
    gradient_checkpointing: bool = False
    log_freq: int = 1
    ckpt_freq: int = 1
    only_save_trainable_params: bool = False
    decoder_loss_fraction: float = 1.0  # <1.0 = Sesame compute amortization
    learning_rate: Optional[float] = None  # for state reporting only
    mesh: Optional[Any] = None  # jax.sharding.Mesh for data parallelism
    # "replicated": plain DP (params/opt state replicated, grads all-reduce).
    # "fsdp": ZeRO-3-style — params AND optimizer state stored sharded over
    # "data" (parallel.mesh.fsdp_leaf_spec); XLA all-gathers weights on use
    # and reduce-scatters grads. ~1/n_data memory per chip.
    param_sharding: str = "replicated"
    trainable_filter: Optional[Callable[[str], bool]] = None  # LoRA masking
    checkpoint_backend: str = "safetensors"  # or "orbax" (async saves)


@dataclass
class DPOArgs(TrainArgs):
    beta: float = 0.1


@dataclass
class KTOArgs(TrainArgs):
    reference_model: Optional[CSM] = None
    beta: float = 0.1
    desirable_weight: float = 1.0
    undesirable_weight: float = 1.0


@dataclass
class TrainerState:
    step: int = 0
    epoch: int = 0
    learning_rate: float = 0.0


@dataclass
class TrainingRecord:
    step: int
    epoch: int
    loss: float
    learning_rate: float


class History:
    def __init__(self):
        self.records: List[TrainingRecord] = []

    def log(self, step: int, epoch: int, loss: float, lr: float):
        self.records.append(TrainingRecord(step, epoch, loss, lr))

    @property
    def state(self):
        return [asdict(r) for r in self.records]

    @state.setter
    def state(self, records: List[Dict]):
        self.records = [TrainingRecord(**r) for r in records]


# ---------------------------------------------------------------------------
# Checkpointing (directory layout parity with trainer.py:95-173)
# ---------------------------------------------------------------------------


class CheckpointManager:
    """File-layout parity with the reference (trainer.py:95-173) by default
    (`backend="safetensors"`); `backend="orbax"` swaps the tensor IO for
    orbax's ASYNC checkpointer — saves overlap training (the TPU-idiomatic
    choice for large runs; SURVEY.md §5.4).

    Orbax layout: tensors are written ONCE per save, to `step_N/orbax`
    (orbax's tmp-dir + rename commit makes each step dir atomic); the
    run-root `trainer_state.json` stays for observability but resume scans
    the step dirs and uses the newest COMMITTED one — a crash during the
    async write window simply falls back to the previous step."""

    def __init__(
        self,
        model: CSM,
        opt_state_ref: Dict[str, Any],
        state: TrainerState,
        history: History,
        checkpoint_dir: Path,
        only_save_trainable_params: bool = False,
        trainable_filter: Optional[Callable[[str], bool]] = None,
        backend: str = "safetensors",
    ):
        self.model = model
        self.opt_state_ref = opt_state_ref  # {"opt_state": pytree}
        self.state = state
        self.history = history
        self.dir = Path(checkpoint_dir)
        self.only_save_trainable_params = only_save_trainable_params
        self.trainable_filter = trainable_filter
        if backend not in ("safetensors", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        self.backend = backend
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        os.makedirs(self.dir, exist_ok=True)

    def _weights_flat(self) -> Dict[str, np.ndarray]:
        from csm_mlx_tpu.loaders import params_to_reference_flat

        flat = params_to_reference_flat(self.model.params)
        if self.only_save_trainable_params and self.trainable_filter:
            flat = {k: v for k, v in flat.items() if self.trainable_filter(k)}
        return {k: np.asarray(v) for k, v in flat.items()}

    def _opt_flat(self) -> Dict[str, np.ndarray]:
        # Index by a counter over *array* leaves only — load() walks the tree
        # with the same counter, so save/load stay aligned even when the opt
        # state holds non-array leaves (e.g. schedule callables) before an
        # array leaf.
        leaves = [l for l in jax.tree.leaves(self.opt_state_ref.get("opt_state"))
                  if hasattr(l, "shape")]
        return {f"opt.{i}": np.asarray(l) for i, l in enumerate(leaves)}

    def save(self):
        suffix = f"step_{self.state.step}"
        trainer_state = {
            "trainer_state": asdict(self.state),
            "history": self.history.state,
        }
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            self.wait()  # one in-flight async save at a time
            # One async write, to the step dir only: orbax commits via
            # tmp-dir rename, so step_N/orbax is all-or-nothing and resume
            # can trust the newest committed step. The per-step json goes
            # down first (it describes the step; a crash before the tensor
            # commit leaves a json-only dir that load() skips). The
            # run-root json is advisory (progress visibility).
            step_root = self.dir / suffix
            os.makedirs(step_root, exist_ok=True)
            with open(step_root / "trainer_state.json", "w") as f:
                json.dump(trainer_state, f, indent=2)
            with open(self.dir / "trainer_state.json", "w") as f:
                json.dump(trainer_state, f, indent=2)
            if (step_root / "orbax").exists():
                # a same-step re-save (end-of-epoch right after a periodic
                # save) would be byte-identical: keep the committed one and
                # skip the device->host payload transfer entirely
                print(f"Checkpoint step {self.state.step} already "
                      f"committed; refreshed trainer state only")
                return
            payload = {"weights": self._weights_flat()}
            opt = self._opt_flat()
            if opt:
                payload["opt"] = opt
            self._orbax.save((step_root / "orbax").absolute(),
                             args=ocp.args.StandardSave(payload))
            print(f"Saved checkpoint (step {self.state.step}, orbax async)")
            return
        from safetensors.numpy import save_file

        # One device->host transfer, written to both roots (the flats are
        # several GB at production scale; fetching them per root doubled
        # the stall).
        weights = self._weights_flat()
        opt = self._opt_flat()
        for root in (self.dir / suffix, self.dir):
            os.makedirs(root, exist_ok=True)
            save_file(weights, str(root / "latest.safetensors"))
            if opt:
                save_file(opt, str(root / "optimizer_state.safetensors"))
            with open(root / "trainer_state.json", "w") as f:
                json.dump(trainer_state, f, indent=2)
        print(f"Saved checkpoint (step {self.state.step})")

    def wait(self):
        """Block until any in-flight async (orbax) save has committed."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def _restore_opt(self, flat: Dict[str, Any]) -> None:
        """Rebuild the optimizer-state pytree from `opt.{i}` array entries
        (same array-leaf enumeration as _opt_flat)."""
        leaves, treedef = jax.tree.flatten(self.opt_state_ref["opt_state"])
        new_leaves = []
        j = 0
        for leaf in leaves:
            if hasattr(leaf, "shape"):
                new_leaves.append(jnp.asarray(flat[f"opt.{j}"],
                                              dtype=leaf.dtype))
                j += 1
            else:
                new_leaves.append(leaf)
        self.opt_state_ref["opt_state"] = jax.tree.unflatten(
            treedef, new_leaves)

    def _committed_orbax_steps(self):
        """step_N dirs whose orbax checkpoint committed (rename is atomic),
        newest first."""
        out = []
        for d in self.dir.glob("step_*"):
            if (d / "orbax").exists() and \
                    (d / "trainer_state.json").exists():
                try:
                    out.append((int(d.name.split("_", 1)[1]), d))
                except ValueError:
                    continue
        return [d for _, d in sorted(out, reverse=True)]

    def _check_backend_mismatch(self):
        """A run dir written by the other backend must fail loudly, not
        silently resume trainer state over missing/stale weights. An
        orbax-origin dir is recognized by committed step_*/orbax dirs OR —
        for a run that crashed before its first commit — step dirs holding
        only a trainer_state.json (the safetensors layout always writes
        latest.safetensors into its step dirs)."""
        has_orbax = bool(list(self.dir.glob("step_*/orbax"))) or any(
            (d / "trainer_state.json").exists()
            and not (d / "latest.safetensors").exists()
            for d in self.dir.glob("step_*")
        )
        has_st = (self.dir / "latest.safetensors").exists()
        if self.backend == "safetensors" and has_orbax and not has_st:
            raise ValueError(
                f"{self.dir} holds an orbax checkpoint but the trainer was "
                f"built with checkpoint_backend='safetensors'; pass "
                f"checkpoint_backend='orbax' to resume it."
            )
        if self.backend == "orbax" and has_st and not has_orbax:
            raise ValueError(
                f"{self.dir} holds a safetensors checkpoint but the trainer "
                f"was built with checkpoint_backend='orbax'; pass "
                f"checkpoint_backend='safetensors' to resume it."
            )

    def _apply_trainer_state(self, state_path) -> bool:
        if not state_path.exists():
            return False
        with open(state_path) as f:
            trainer_state = json.load(f)
        ts = trainer_state["trainer_state"]
        self.state.step = ts["step"]
        self.state.epoch = ts["epoch"]
        self.state.learning_rate = ts["learning_rate"]
        self.history.state = trainer_state["history"]
        print(f"Loaded trainer state (step {self.state.step})")
        return True

    def _load_orbax(self) -> bool:
        for step_dir in self._committed_orbax_steps():
            try:
                restored = self._orbax.restore(
                    (step_dir / "orbax").absolute())
                from csm_mlx_tpu.loaders import _merge, flat_to_tree

                tree = flat_to_tree({k: jnp.asarray(v)
                                     for k, v in restored["weights"].items()})
                if self.model.params is None:
                    self.model.params = tree
                else:
                    self.model.params = _merge(self.model.params, tree)
                print(f"Loaded latest run weights from {step_dir / 'orbax'}")
                if "opt" in restored and \
                        self.opt_state_ref.get("opt_state") is not None:
                    self._restore_opt(restored["opt"])
                    print("Loaded optimizer state (orbax)")
                # trainer state from the SAME committed step dir: a crash
                # mid-async-save leaves the run-root json a step ahead of
                # the newest committed tensors — resuming from the step dir
                # keeps weights and step counter consistent.
                self._apply_trainer_state(step_dir / "trainer_state.json")
                return True
            except Exception as exc:  # partial/corrupt step: try the next
                print(f"[WARN] could not resume from {step_dir}: {exc}; "
                      f"trying an older checkpoint")
                continue
        return False

    def load(self):
        self._check_backend_mismatch()
        if self.backend == "orbax":
            if not self._load_orbax():
                print("Trainer state not found. Starting fresh training.")
            return

        weights_path = self.dir / "latest.safetensors"
        state_path = self.dir / "trainer_state.json"
        opt_path = self.dir / "optimizer_state.safetensors"

        if weights_path.exists():
            self.model.load_weights(str(weights_path), strict=False)
            print(f"Loaded latest run weights from {weights_path}")

        if opt_path.exists() and \
                self.opt_state_ref.get("opt_state") is not None:
            from safetensors.numpy import load_file

            self._restore_opt(load_file(str(opt_path)))
            print(f"Loaded optimizer state from {opt_path}")

        if not self._apply_trainer_state(state_path):
            print("Trainer state not found. Starting fresh training.")


# ---------------------------------------------------------------------------
# SFT trainer
# ---------------------------------------------------------------------------


class CSMTrainer:
    """CSM SFT trainer (reference CSMTrainer, trainer.py:176-481)."""

    loss_requires: type = CSMDataset

    def __init__(self, args: TrainArgs):
        self.model = args.model
        self.args = args
        # Derived "_"-prefixed param caches (e.g. the "_resident" decoder
        # tables from quantize_model) would go stale the moment weights
        # update — and they break the masked-optimizer/flattening plumbing,
        # which skips "_" keys. Training drops them (same as shard_model).
        if isinstance(self.model.params, dict):
            for k in [k for k in self.model.params
                      if isinstance(k, str) and k.startswith("_")]:
                del self.model.params[k]
        self.optimizer = self._wrap_optimizer(args.optimizer)
        self.opt_state_ref: Dict[str, Any] = {
            "opt_state": self.optimizer.init(self.model.params)
        }
        self.state = TrainerState(learning_rate=float(args.learning_rate or 0.0))
        self.history = History()
        self.checkpointer = CheckpointManager(
            self.model, self.opt_state_ref, self.state, self.history,
            args.output_dir, args.only_save_trainable_params,
            args.trainable_filter, backend=args.checkpoint_backend,
        )
        self.checkpointer.load()
        if args.mesh is not None:
            if args.param_sharding == "fsdp":
                from csm_mlx_tpu.parallel.mesh import shard_params_fsdp

                self.model.params = shard_params_fsdp(
                    self.model.params, args.mesh)
                self.opt_state_ref["opt_state"] = shard_params_fsdp(
                    self.opt_state_ref["opt_state"], args.mesh)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(args.mesh, P())
                self.model.params = jax.device_put(self.model.params, rep)
                self.opt_state_ref["opt_state"] = jax.device_put(
                    self.opt_state_ref["opt_state"], rep
                )
        self._step_fn: Optional[Callable] = None
        self._rng = jax.random.PRNGKey(0)

    def _wrap_optimizer(self, opt: optax.GradientTransformation):
        if self.args.trainable_filter is not None:
            flt = self.args.trainable_filter
            # Frozen params get zero updates (optax.masked would pass raw
            # gradients through for masked-out leaves).
            opt = optax.multi_transform(
                {"train": opt, "freeze": optax.set_to_zero()},
                lambda params: jax.tree.map(
                    lambda m: "train" if m else "freeze",
                    _mask_tree(params, flt),
                ),
            )
        return opt

    # -- loss (overridden by DPO/KTO) -----------------------------------
    def _loss_fn(self, params, batch, rng):
        from contextlib import nullcontext

        from csm_mlx_tpu.ops.act_sharding import activation_sharding
        from csm_mlx_tpu.ops.layers import lora_dropout_rng

        drop_rng, loss_rng = jax.random.split(rng)
        # With a mesh, pin activation shardings at trace time so the SPMD
        # partitioner doesn't guess (it guesses its way into full
        # rematerialization on the attention softmax otherwise).
        act = (activation_sharding(self.args.mesh)
               if self.args.mesh is not None else nullcontext())
        # LoRA dropout (param dicts carrying `lora_dropout`) is live only
        # inside this scope — inference and frozen-reference forwards stay
        # deterministic.
        with act, lora_dropout_rng(drop_rng):
            return compute_loss(
                params, self.model.args, batch,
                first_codebook_weight_multiplier=
                    self.args.first_codebook_weight_multiplier,
                decoder_loss_fraction=self.args.decoder_loss_fraction,
                remat=self.args.gradient_checkpointing,
                rng=loss_rng,
            )

    # -- compiled step ---------------------------------------------------
    def _step_consts(self):
        """Extra pytree passed through the jitted step as a REAL argument.

        Anything `_loss_fn` needs beyond (params, batch, rng) must ride
        here, not a closure: closed-over arrays become jit *constants*,
        which are serialized into every lowering — KTO's frozen reference
        params captured this way cost 3.1 GB of constants per compile
        (minutes of remote-tunnel traffic on axon). Keys become keyword
        arguments of `_loss_fn`."""
        return {}

    def _build_step(self):
        optimizer = self.optimizer
        max_norm = self.args.max_norm
        loss_fn = self._loss_fn

        def step(params, opt_state, batch, rng, consts):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng, **consts)
            )(params)
            if max_norm > 0:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
            else:
                gnorm = jnp.zeros(())
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, gnorm

        # Sharding comes from the (committed) argument placements:
        # _prepare_batch shards batches over the "data" axis and __init__
        # replicates params/opt state across the mesh. XLA inserts the
        # gradient all-reduce. Under FSDP the outputs are pinned back to
        # the sharded storage layout so params/opt state never silently
        # gather to replicated across steps (and donation stays valid).
        jit_kwargs = {}
        if (self.args.mesh is not None
                and self.args.param_sharding == "fsdp"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from csm_mlx_tpu.parallel.mesh import fsdp_leaf_spec

            mesh = self.args.mesh

            def _ns(x):
                return NamedSharding(mesh, fsdp_leaf_spec(x, mesh))

            jit_kwargs["out_shardings"] = (
                jax.tree.map(_ns, self.model.params),
                jax.tree.map(_ns, self.opt_state_ref["opt_state"]),
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P()),
            )
        return jax.jit(step, donate_argnums=(0, 1), **jit_kwargs)

    def _prepare_batch(self, batch):
        if self.args.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.args.mesh
            n = int(dict(mesh.shape).get("data", 1))
            b = next(iter(batch.values())).shape[0]
            if b % n:
                # A P("data") sharding requires dim 0 divisible by the data
                # axis, and the ragged final batch of an epoch generally
                # isn't — pad it by cycling rows. The padded rows duplicate
                # real samples (a mild oversampling of <=n-1 rows once per
                # epoch), which beats crashing on every epoch's last step.
                rows = np.resize(np.arange(b), b + (n - b % n))
                batch = {k: np.asarray(v)[rows] for k, v in batch.items()}
            dp = NamedSharding(mesh, P("data"))
            return {k: jax.device_put(jnp.asarray(v), dp)
                    for k, v in batch.items()}
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def train_step(self, batch: Dict[str, np.ndarray]) -> float:
        # One jitted step serves every batch bucket: jax.jit retraces (and
        # caches) per input shape on its own, so no per-shape bookkeeping.
        if self._step_fn is None:
            self._step_fn = self._build_step()
        self._rng, sub = jax.random.split(self._rng)
        params, opt_state, loss, _ = self._step_fn(
            self.model.params, self.opt_state_ref["opt_state"],
            self._prepare_batch(batch), sub, self._step_consts(),
        )
        self.model.params = params
        self.opt_state_ref["opt_state"] = opt_state
        return float(loss)

    # -- epoch loop (resume arithmetic parity, trainer.py:381-481) -------
    def train(self, dataset, batch_size: int, epochs: int,
              shuffle: bool = True) -> History:
        if not isinstance(dataset, self.loss_requires):
            raise TypeError(
                f"Please use `{self.loss_requires.__name__}` instead of other "
                f"dataset types."
            )
        from tqdm import tqdm

        num_samples = len(dataset)
        steps_per_epoch = (num_samples + batch_size - 1) // batch_size

        start_epoch = self.state.epoch
        start_step = self.state.step
        resume_batch_idx = 0
        if start_epoch < epochs and start_step > 0:
            completed = start_epoch * steps_per_epoch
            if start_step > completed:
                # start_step - completed, NOT start_step % steps_per_epoch:
                # a checkpoint taken at exactly the last step of an epoch
                # (crash before the end-of-epoch save bumps state.epoch)
                # must resume as "epoch done" (the empty-remaining path
                # below), not re-train the whole epoch from batch 0.
                resume_batch_idx = min(start_step - completed,
                                       steps_per_epoch)
        if start_epoch > 0 or resume_batch_idx > 0:
            print(f"Resuming from Epoch {start_epoch + 1}, Step {start_step + 1}")

        for epoch in range(start_epoch, epochs):
            indices = np.arange(num_samples)
            if shuffle:
                # Per-epoch seed: a mid-epoch resume recreates the SAME
                # permutation the interrupted epoch used, so skipping the
                # first `resume_batch_idx` batches skips exactly the data
                # already trained. (The reference shuffles unseeded,
                # trainer.py:405 — its resume silently double-trains some
                # samples and drops others.)
                indices = np.random.RandomState(1234 + epoch).permutation(
                    indices)
            batch_indices = [
                indices[i : i + batch_size].tolist()
                for i in range(0, num_samples, batch_size)
            ]
            start_idx = resume_batch_idx if epoch == start_epoch else 0
            remaining = batch_indices[start_idx:]
            if not remaining:
                print(f"Epoch {epoch + 1} already fully completed in previous "
                      f"run. Skipping.")
                self.state.epoch = epoch + 1
                continue

            pbar = tqdm(remaining, desc=f"Epoch {epoch + 1}/{epochs}",
                        total=len(batch_indices), initial=start_idx)
            epoch_loss, n_batches = 0.0, 0
            for batch_idx_list in pbar:
                batch = dataset.get_batch(batch_idx_list)
                loss = self.train_step(batch)
                self.state.step += 1
                if self.args.learning_rate is not None:
                    self.state.learning_rate = float(self.args.learning_rate)
                epoch_loss += loss
                n_batches += 1
                if self.state.step % self.args.log_freq == 0:
                    self.history.log(self.state.step, epoch, loss,
                                     self.state.learning_rate)
                    pbar.set_postfix({"step": self.state.step,
                                      "loss": f"{loss:.4f}"})
                if self.args.ckpt_freq > 0 and \
                        self.state.step % self.args.ckpt_freq == 0:
                    self.checkpointer.save()

            if n_batches:
                print(f"Epoch {epoch + 1} average loss: "
                      f"{epoch_loss / n_batches:.4f}")
            self.state.epoch = epoch + 1
            print(f"Completed Epoch {epoch + 1}. Saving checkpoint.")
            self.checkpointer.save()
        self.checkpointer.wait()  # commit any in-flight async (orbax) save
        return self.history


def _mask_tree(params, trainable_filter: Callable[[str], bool]):
    flat = tree_to_flat(params)
    mask_flat = {k: bool(trainable_filter(k)) for k in flat}
    from csm_mlx_tpu.parallel.mesh import _unflatten_like

    return _unflatten_like(params, mask_flat)


# ---------------------------------------------------------------------------
# DPO
# ---------------------------------------------------------------------------


class DPOTrainer(CSMTrainer):
    """Sigmoid-margin preference trainer (trainer.py:484-603)."""

    loss_requires = CSMPairwiseDataset

    def __init__(self, args: DPOArgs):
        if not isinstance(args, DPOArgs):
            raise TypeError("Please use `DPOArgs` instead of other trainer's "
                            "arguments.")
        if args.decoder_loss_fraction != 1.0:
            # Preference losses need per-sample CE over identical decoder
            # positions across the compared forwards; subsampling would make
            # the margins incomparable. Reject rather than silently ignore.
            raise ValueError(
                "decoder_loss_fraction is not supported by preference "
                "trainers (per-sample losses must score the same decoder "
                "positions)."
            )
        super().__init__(args)
        self.beta = args.beta

    def _loss_fn(self, params, batch, rng):
        from csm_mlx_tpu.ops.layers import lora_dropout_rng

        fcw = self.args.first_codebook_weight_multiplier
        chosen = {"tokens": batch["chosen_tokens"],
                  "masks": batch["chosen_masks"],
                  "loss_masks": batch["chosen_loss_masks"]}
        rejected = {"tokens": batch["rejected_tokens"],
                    "masks": batch["rejected_masks"],
                    "loss_masks": batch["rejected_loss_masks"]}
        args = self.model.args
        remat = self.args.gradient_checkpointing
        with lora_dropout_rng(rng):
            chosen_loss = compute_loss(params, args, chosen, per_sample=True,
                                       first_codebook_weight_multiplier=fcw,
                                       remat=remat)
            rejected_loss = compute_loss(params, args, rejected,
                                         per_sample=True,
                                         first_codebook_weight_multiplier=fcw,
                                         remat=remat)
        margin = -(chosen_loss - rejected_loss) * self.beta
        return jnp.mean(-jax.nn.log_sigmoid(margin))


# ---------------------------------------------------------------------------
# KTO
# ---------------------------------------------------------------------------


class KTOTrainer(CSMTrainer):
    """KTO trainer with a frozen reference model (trainer.py:606-788)."""

    loss_requires = CSMPointwiseDataset

    def __init__(self, args: KTOArgs):
        if not isinstance(args, KTOArgs):
            raise TypeError("Please use `KTOArgs` instead of other trainer's "
                            "arguments.")
        if args.reference_model is None:
            raise ValueError("Reference model must be provided.")
        if args.decoder_loss_fraction != 1.0:
            raise ValueError(
                "decoder_loss_fraction is not supported by preference "
                "trainers (per-sample losses must score the same decoder "
                "positions)."
            )
        super().__init__(args)
        self.beta = args.beta
        self.desirable_weight = args.desirable_weight
        self.undesirable_weight = args.undesirable_weight
        self.reference_model = args.reference_model
        # The frozen reference's params ride the jitted step as an argument
        # (_step_consts — NOT closure constants, which would serialize 3 GB
        # into every lowering), so the committed placement below is what the
        # compiled program sees. They must carry the same placement as the
        # policy params: under
        # FSDP an unsharded copy would otherwise replicate onto every chip
        # and claw back most of ZeRO-3's memory saving. NOTE: like the
        # policy model, the caller's CSM object is re-placed IN PLACE (the
        # trainer owns both models for its lifetime — same convention as
        # CSMTrainer.__init__ sharding self.model.params).
        if args.mesh is not None:
            if args.param_sharding == "fsdp":
                from csm_mlx_tpu.parallel.mesh import shard_params_fsdp

                self.reference_model.params = shard_params_fsdp(
                    self.reference_model.params, args.mesh)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self.reference_model.params = jax.device_put(
                    self.reference_model.params, NamedSharding(args.mesh, P()))

    def _step_consts(self):
        # The frozen reference params ride the jitted step as an argument:
        # captured as closure constants they serialize 3.1 GB into every
        # lowering (see CSMTrainer._step_consts).
        return {"ref_params": self.reference_model.params}

    def _loss_fn(self, params, batch, rng, ref_params):
        args = self.model.args
        fcw = self.args.first_codebook_weight_multiplier
        remat = self.args.gradient_checkpointing
        core = {"tokens": batch["tokens"], "masks": batch["masks"],
                "loss_masks": batch["loss_masks"]}

        from csm_mlx_tpu.ops.layers import lora_dropout_rng

        kl_reference = compute_loss(ref_params, args, core, per_sample=True,
                                    cause_mismatch=True,
                                    first_codebook_weight_multiplier=fcw)
        reference = compute_loss(ref_params, args, core, per_sample=True,
                                 first_codebook_weight_multiplier=fcw)
        # Dropout applies to the trainable policy forwards only; the frozen
        # reference model above runs deterministic (eval mode).
        with lora_dropout_rng(rng):
            kl_policy = compute_loss(params, args, core, per_sample=True,
                                     cause_mismatch=True,
                                     first_codebook_weight_multiplier=fcw,
                                     remat=remat)
            policy = compute_loss(params, args, core, per_sample=True,
                                  first_codebook_weight_multiplier=fcw,
                                  remat=remat)

        reward = policy - reference
        # The KL proxy is a detached baseline (the reference computes it
        # outside nn.value_and_grad and passes it in as a constant) — no
        # gradients may flow through it.
        kl = jax.lax.stop_gradient(
            jnp.clip(jnp.mean(kl_policy - kl_reference), 0.0, None)
        )
        penalized_reward = reward - kl

        preferences = batch["preferences"]
        desirable = (preferences > 0).astype(jnp.float32)
        undesirable = (preferences < 0).astype(jnp.float32)
        losses = (
            self.desirable_weight * desirable
            * (1.0 - jax.nn.sigmoid(self.beta * penalized_reward))
            + self.undesirable_weight * undesirable
            * (1.0 - jax.nn.sigmoid(-self.beta * penalized_reward))
        )
        return losses.mean()
