"""Shared task-API surface (the read-only attributes and model-residency
methods every reference pybind class exposes:
python/cpp/{translator,generator,whisper,encoder,wav2vec2}.cc)."""

from __future__ import annotations

from .pool import current_worker_index


class TaskAPIMixin:
    """Mixin for classes owning ``self.model`` (LoadedModel) and
    ``self._pool`` (WorkerPool).

    ``model``/``engine`` are replica-aware properties: when the instance
    holds data-parallel replicas (``device_index=[0,1,..]``), a worker
    thread resolves them to the replica pinned to its device, so every
    compute method transparently runs on the executing worker's chip
    (reference: per-worker model replicas, replica_pool.h:19-300).
    User threads (no worker identity) see replica 0.
    """

    # ------------------------------------------------------------------
    # Replica-aware model/engine resolution.
    # ------------------------------------------------------------------

    @property
    def model(self):
        replicas = getattr(self, "_replicas", None)
        if replicas:
            i = current_worker_index()
            if i is not None:
                return replicas[i % len(replicas)][0]
        return self._model

    @model.setter
    def model(self, value):
        self._model = value

    @property
    def engine(self):
        replicas = getattr(self, "_replicas", None)
        if replicas:
            i = current_worker_index()
            if i is not None:
                return replicas[i % len(replicas)][1]
        return getattr(self, "_engine", None)

    @engine.setter
    def engine(self, value):
        self._engine = value

    def _apply_flash_flag(self, kwargs) -> None:
        """Honor the reference's ``flash_attention`` constructor flag.

        The reference opts INTO FA2 with it (python/cpp/translator.cc:295);
        here flash attention is dispatched automatically by measured
        crossover, so True removes the length threshold FOR THIS MODEL
        (the threshold lives on the arch spec, which keys the jit caches)
        and False keeps automatic dispatch.
        """
        if kwargs.get("flash_attention"):
            import dataclasses

            self._model.arch = dataclasses.replace(
                self._model.arch, flash_min_len=0)

    def _setup_tensor_parallel(self, device: str, device_index) -> None:
        """One-flag TP: shard the loaded model over a mesh of the visible
        devices (reference: tensor_parallel=True splits weights at load,
        src/models/model.cc:827-899). Params/consts become committed
        sharded arrays, so every subsequent compute path is
        tensor-parallel with no manual mesh plumbing."""
        if not getattr(self, "_tensor_parallel", False):
            return
        from ..parallel.sharding import apply_tensor_parallel

        apply_tensor_parallel(self._model, device, device_index)

    def _init_replicas(self, device: str, device_index, engine_factory=None):
        """Build one (model, engine) replica per requested device.

        Replica 0 reuses the already-loaded model (placed on the first
        device by the constructor); the others are ``replicate_model``
        copies. No-op for a scalar ``device_index``, and under one-flag
        tensor parallelism (a device_index list becomes the mesh's data
        axis instead — see _setup_tensor_parallel).
        """
        from ..models.loader import replicate_model, resolve_devices

        if getattr(self, "_tensor_parallel", False):
            self._replicas = None
            return
        if not isinstance(device_index, (list, tuple)) or len(device_index) < 2:
            self._replicas = None
            return
        devices = resolve_devices(device, device_index)
        self._model._home_device = devices[0]
        replicas = [(self._model, getattr(self, "_engine", None))]
        for dev in devices[1:]:
            m = replicate_model(self._model, dev)
            e = engine_factory(m) if engine_factory is not None else None
            replicas.append((m, e))
        self._replicas = replicas

    @property
    def num_replicas(self) -> int:
        replicas = getattr(self, "_replicas", None)
        return len(replicas) if replicas else 1

    def _all_models(self):
        replicas = getattr(self, "_replicas", None)
        if replicas:
            return [m for m, _ in replicas]
        return [self._model]

    @property
    def compute_type(self) -> str:
        """Resolved compute type (e.g. ``int8_bfloat16`` on TPU)."""
        p = self.model.policy
        if p.weight_dtype == "int8":
            # Fully resolved form, like the reference ("int8" on CPU
            # resolves to int8_float32 — src/types.cc).
            return "int8_" + p.activation_dtype
        return p.weight_dtype

    @property
    def tensor_parallel(self) -> bool:
        return getattr(self, "_tensor_parallel", False)

    @property
    def num_workers(self) -> int:
        return self._pool.num_workers

    @property
    def num_queued_batches(self) -> int:
        return self._pool.num_queued_batches

    @property
    def num_active_batches(self) -> int:
        return self._pool.num_active_batches

    # Model residency (reference: replica_pool detach/set model).

    @property
    def model_is_loaded(self) -> bool:
        return getattr(self, "_unloaded_params", None) is None

    def unload_model(self, to_cpu: bool = False):
        """Move the weights off the accelerator (optionally keeping a host
        copy for a later load_model()). With data-parallel replicas, every
        replica's weights are dropped; one host copy is kept.

        Like the reference (replica_pool.h:110-116), this is a no-op while
        batches are still being processed — the model is not guaranteed to
        be unloaded if requests run concurrently. Unlike the reference we
        honor ``to_cpu=True`` on the CPU backend too (it still releases
        the per-engine jit caches), since the real device here is the TPU.
        """
        import jax

        if not self.model_is_loaded:
            return
        if self.num_active_batches > 0:
            return
        cpu = jax.devices("cpu")[0]
        self._unloaded_params = (
            jax.device_put(self._model.params, cpu) if to_cpu else True)
        for m in self._all_models():
            m.params = None
        replicas = getattr(self, "_replicas", None)
        engines = ([e for _, e in replicas] if replicas
                   else [getattr(self, "_engine", None)])
        for engine in engines:
            if engine is not None:
                engine._loop_fns.clear()
                engine._step_fns.clear()

    def load_model(self):
        """Reload weights onto the original device(s) after unload_model()."""
        import jax

        if self.model_is_loaded:
            return
        if self._unloaded_params is True:
            raise RuntimeError(
                "Model was unloaded without keeping a host copy")
        host = self._unloaded_params
        models = self._all_models()
        devices = [getattr(m, "_home_device", None) or jax.devices()[0]
                   for m in models]
        for m, dev in zip(models, devices):
            if m.mesh is not None:
                from ..parallel.sharding import shard_params

                m.params = shard_params(host, m.arch, m.mesh)
            else:
                m.params = jax.device_put(host, dev)
        self._unloaded_params = None
