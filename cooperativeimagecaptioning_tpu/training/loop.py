"""Training driver (ref: train.py).

One iteration = turn selection -> schedule updates -> batch -> [stage A sampling +
host CIDEr-D reward] -> jitted grad step -> per-agent optimizer updates -> logging;
periodic checkpoint operations run eval and persist the full artifact taxonomy
(ref: train.py:473-562, operations_in_checkpoint :438-470).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cooperativeimagecaptioning_tpu import config as config_mod
from cooperativeimagecaptioning_tpu.data import DataLoader
from cooperativeimagecaptioning_tpu.rewards import self_critical
from cooperativeimagecaptioning_tpu.training import joint, schedules
from cooperativeimagecaptioning_tpu.training.checkpoint import CheckpointManager
from cooperativeimagecaptioning_tpu.training.optim import (
    OptimizerManager, effective_turns)


class Trainer:
    def __init__(self, opt, dataset=None, rng_seed=None, verbose=True):
        opt.use_att = config_mod.if_use_att(opt)
        self.opt = opt
        self.verbose = verbose
        self.loader = DataLoader(opt, dataset=dataset,
                                 prefetch=getattr(opt, "prefetch_batches", 0) > 0
                                 and dataset is None)
        opt.vocab_size = self.loader.vocab_size
        opt.seq_length = self.loader.seq_length

        self.ckpt = CheckpointManager(opt)
        infos = self.ckpt.load_infos()
        histories = self.ckpt.load_histories()

        # model params (+ bootstrap cascade).  Order mirrors the reference's
        # two branches (AlternatingJointModel.py:131-177):
        #  alternating — init-time seeds (stage-2 speaker + stage-1 listener
        #    via initialize_retrieval) apply FIRST, then the lenient
        #    start_from load overrides whatever keys the checkpoint has: a
        #    fresh seeded dir holds NO alternatingModel.pth (run_joint.py
        #    seed_checkpoint_dir keeps the stage-2 name), so the seeds win;
        #    a mid-joint resume keeps the TRAINED listener.
        #  non-alternating — load model.pth FIRST (that's how the speaker
        #    ablations get their seeded stage-2 speaker), THEN overlay the
        #    initialize_retrieval listener (ref else-branch order).
        seed = rng_seed if rng_seed is not None else getattr(opt, "seed", 123)
        params = joint.init_params(jax.random.PRNGKey(seed), opt)
        import os
        from cooperativeimagecaptioning_tpu.training import checkpoint as ck

        def overlay_listener(params):
            # listener-only init (ref: AlternatingJointModel.py:169-177)
            ir = getattr(opt, "initialize_retrieval", None)
            if ir and os.path.isfile(ir):
                loaded = ck.load_params(ir)
                if "listener" in loaded:
                    params = dict(params)
                    params["listener"] = jax.tree.map(
                        jnp.asarray, loaded["listener"])
            return params

        if opt.is_alternating:
            resumed = False
            if getattr(opt, "continue_from_existing_models", True):
                # flag off = fresh params, NO loading at all (ref cascade
                # is inside `if opt.continue_from_existing_models`,
                # AlternatingJointModel.py:131-166)
                if opt.speaker_stage_2_model_path and \
                        os.path.isfile(opt.speaker_stage_2_model_path):
                    params = ck.load_params_into(
                        params, opt.speaker_stage_2_model_path)
                params = overlay_listener(params)
                params, resumed = self.ckpt.try_load_model(params)
        else:
            params, resumed = self.ckpt.try_load_model(params)
            if not resumed and opt.speaker_stage_2_model_path and \
                    os.path.isfile(opt.speaker_stage_2_model_path):
                # non-alternating speaker ablation run whose dir wasn't
                # seeded with a model.pth copy: seed the speaker directly
                params = ck.load_params_into(
                    params, opt.speaker_stage_2_model_path)
            params = overlay_listener(params)
        # device mesh (TPU-native; the reference is single-GPU,
        # ref train.py:181-185 — SURVEY §2.3). Params are committed to the
        # mesh (replicated, vocab matrices optionally sharded on 'model');
        # batches are sharded on 'data'; GSPMD then partitions the existing
        # jitted step/sample/update programs and inserts the gradient
        # all-reduce + contrastive all-gathers over ICI — no separate
        # distributed code path.
        self.mesh = None
        n_data = int(getattr(opt, "mesh_data_axis", 0) or 0)
        n_model = int(getattr(opt, "mesh_model_axis", 1) or 1)
        if n_data > 1 or n_model > 1:
            from cooperativeimagecaptioning_tpu import parallel
            if n_data == 0:
                # 0 = auto (all remaining devices); an EXPLICIT 1 means a
                # model-only mesh and must not be expanded
                n_data = max(1, len(jax.devices()) // n_model)
            n_data = max(1, n_data)
            eff_batch = opt.batch_size * opt.seq_per_img
            assert eff_batch % n_data == 0, (
                f"batch_size*seq_per_img ({eff_batch}) must divide the data "
                f"axis ({n_data})")
            self.mesh = parallel.make_mesh(n_data=n_data, n_model=n_model)
            self._param_shardings = parallel.param_shardings(
                params, self.mesh, vocab_sharded=n_model > 1)
            params = jax.device_put(params, self._param_shardings)
            if n_model > 1:
                # switch the vocab-head kernels to their shard_map variants
                # (ops/pallas/_dispatch.py) — the plain pallas_call path would
                # re-gather the vocab-sharded W every decode step
                from cooperativeimagecaptioning_tpu.ops.pallas import _dispatch
                _dispatch.set_vocab_mesh(self.mesh)
        self.params = params

        self.optim = OptimizerManager(opt, params)
        if resumed:
            # restore per-agent Adam moments/steps alongside the params
            # (ref optimizer.py:149-188; was silently re-initializing)
            self.ckpt.load_optimizers(self.optim)
        else:
            # cross-stage seeding: a fresh joint run carries the stage-2
            # speaker's Adam state and the stage-1 listener's (saved as
            # optimizer.pth next to initialize_retrieval); both are skipped
            # under share_embed (ref optimizer.py:49-96, :60-63, :79-85)
            import os
            if not getattr(opt, "share_embed", 0):
                p2 = getattr(opt, "speaker_stage_2_optimizer_path", "")
                if p2:
                    self.ckpt.load_agent_optimizer(self.optim, "speaker", p2)
                ir = getattr(opt, "initialize_retrieval", "") or ""
                p1 = os.path.join(os.path.dirname(ir), "optimizer.pth")
                if ir and "listener" in self.optim.state_dict() and \
                        os.path.isfile(p1):
                    self.ckpt.load_agent_optimizer(self.optim, "listener", p1)
        self.turns = effective_turns(opt)

        # resume counters (ref: train.py:360-375)
        self.iteration = infos.get("iter", 0)
        self.epoch = infos.get("epoch", 0)
        self.epoch_start = self.epoch
        self.loader.iterators = infos.get("iterators", self.loader.iterators)
        self.loader.split_ix = infos.get("split_ix", self.loader.split_ix)
        self.gumbel_temp = infos.get("gumbel_temp", opt.gumbel_temp)
        self.best_val_score = infos.get("best_val_score", None) \
            if opt.load_best_score else None
        self.best_val_score_vse = infos.get("best_val_score_vse", None) \
            if opt.load_best_score else None
        self.infos = infos
        self.histories = histories
        self.val_result_history = histories.get("val_result_history", {})
        self.loss_history = histories.get("loss_history", {})
        self.lr_history = histories.get("lr_history", {})
        self.ss_prob_history = histories.get("ss_prob_history", {})

        self._step_fns = {}
        self._chunk_fns = {}       # turn -> jitted fused multi-step scan
        self._fused_notice = None  # one-time fallback notice (train())
        self._rng = jax.random.PRNGKey(seed + 1)
        self._evaluator = None
        # cached-df tier for the on-device reward: linear-in-B df lookups
        # (ref non-corpus mode, ciderD_scorer.py:62-75) instead of the
        # O(B^2) corpus-mode containment
        self._df_table = None
        if joint.needs_device_refs(opt) and opt.cached_tokens != "corpus":
            from cooperativeimagecaptioning_tpu.rewards import ngram_device
            self._df_table = ngram_device.load_df_table(
                f"data/{opt.cached_tokens}.p")
            if self.mesh is not None:
                # replicate ONCE: a per-step device_put of an uncommitted
                # table re-copies the whole thing every iteration
                self._df_table = jax.device_put(
                    self._df_table, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()))
        if opt.cider_optimization > 0:
            self_critical.init_scorer(opt.cached_tokens)
        # HBM-resident feature cache (--device_feature_cache): train batches
        # gather fc/att on device by infos[ix] instead of streaming ~40MB of
        # features host->device every step (the full-dim protocol's
        # bottleneck through the tunnel); opt-in, for datasets that fit HBM
        self._feat_cache = None
        if getattr(opt, "device_feature_cache", 0):
            # cache rides the dataset object so multi-stage protocols
            # sharing one dataset (scripts/showcase_full_scale.py,
            # reproduce_coco) transfer the features once per process
            ds = self.loader.ds
            self._feat_cache = getattr(ds, "_device_feat_cache", None)
            if self._feat_cache is not None and opt.use_att and \
                    "att" in self._feat_cache and \
                    self._feat_cache.get("_att_sig") != self._att_cache_sig():
                # a previous stage cached att under DIFFERENT opt-gated
                # transforms (norm_att_feat/use_box/...) or storage dtype —
                # drop its att block rather than silently train on the other
                # stage's feature scaling
                self._feat_cache = {
                    k: v for k, v in self._feat_cache.items()
                    if k not in ("att", "att_mask", "_att_sig")}
            if self._feat_cache is None or (
                    opt.use_att and "att" not in self._feat_cache):
                # a phase-1 (fc+fc) stage builds a fc-only cache; extend it
                # with the att block when a later stage's model needs it
                self._feat_cache = self._build_feature_cache(
                    base=self._feat_cache)
                try:
                    ds._device_feat_cache = self._feat_cache
                except AttributeError:
                    pass
            self.loader.set_feature_free("train")
        self._update_schedules()

    def _put_chunked(self, arr, chunk_bytes=64 << 20):
        """Host->device in bounded chunks, written into one preallocated
        buffer via donated dynamic_update_slice: a single GB-sized device_put
        is one giant RPC that remote/tunneled backends can drop (observed
        wedging the axon tunnel), and chunks + on-device concatenate peaks at
        2x the array (observed HBM OOM at the 20k-image full-dim cache).
        In-place donation keeps the peak at N + one chunk."""
        rows = max(1, chunk_bytes // max(1, arr[0].nbytes))
        if len(arr) <= rows:
            return jnp.asarray(arr)
        upd = jax.jit(
            lambda buf, part, start: jax.lax.dynamic_update_slice_in_dim(
                buf, part, start, 0),
            donate_argnums=(0,))
        buf = jnp.zeros(arr.shape, arr.dtype)
        for i in range(0, len(arr), rows):
            buf = upd(buf, jnp.asarray(arr[i: i + rows]), i)
        return buf

    def _att_cache_sig(self):
        """Identity of the att block's content: the opt-gated transforms
        baked in at build time plus the storage dtype (cross-stage reuse
        must not serve stage A's scaling to stage B)."""
        o = self.opt
        return (int(getattr(o, "norm_att_feat", 0)),
                int(getattr(o, "use_box", 0)),
                int(getattr(o, "norm_box_feat", 0)),
                getattr(o, "feature_cache_dtype", "f32"))

    def _build_feature_cache(self, base=None):
        ds = self.loader.ds
        N = ds.num_images()
        if base is not None and "fc" in base:
            cache = dict(base)
        else:
            fc = np.stack([np.asarray(ds.get_fc(ix), np.float32)
                           for ix in range(N)])
            cache = {"fc": self._put_chunked(fc)}
        if self.opt.use_att and "att" not in cache:
            # storage dtype: bf16 halves both the HBM residency and the
            # (slow, tunneled) host->device transfer; gathered batches are
            # cast back to f32 in _prepare_batch
            if self.opt.feature_cache_dtype == "bf16":
                import ml_dtypes
                store = np.dtype(ml_dtypes.bfloat16)
            else:
                store = np.dtype(np.float32)
            overflow = False
            if self.loader.max_att_len:
                # K is pinned: fill the padded array in ONE pass — holding
                # an f32 list AND the padded array doubles peak host RAM
                # (~12 GB at the 20k full-dim protocol)
                K = self.loader.max_att_len
                att = mask = None
                for i in range(N):
                    a = np.asarray(self.loader.get_transformed_att(i),
                                   np.float32)
                    if a.shape[0] > K:
                        # streaming _assemble GROWS past max_att_len for
                        # oversized images — match it via the general path
                        overflow = True
                        break
                    if att is None:
                        att = np.zeros((N, K, a.shape[1]), store)
                        mask = np.zeros((N, K), np.float32)
                    att[i, : a.shape[0]] = a.astype(store)
                    mask[i, : a.shape[0]] = 1
            if not self.loader.max_att_len or overflow:
                atts = [np.asarray(self.loader.get_transformed_att(ix),
                                   np.float32) for ix in range(N)]
                K = max(a.shape[0] for a in atts)
                if self.loader.max_att_len:
                    K = max(K, self.loader.max_att_len)
                att = np.zeros((N, K, atts[0].shape[1]), store)
                mask = np.zeros((N, K), np.float32)
                for i, a in enumerate(atts):
                    att[i, : a.shape[0]] = a.astype(store)
                    mask[i, : a.shape[0]] = 1
                del atts
            cache["att"] = self._put_chunked(att)
            cache["att_mask"] = jnp.asarray(mask)
        sig = cache.pop("_att_sig", None)  # keep metadata out of device ops
        jax.block_until_ready(cache)
        if self.verbose:
            gb = sum(x.nbytes for x in jax.tree.leaves(cache)) / 2**30
            print(f"device feature cache resident: {N} images, {gb:.2f} GB")
        if self.mesh is not None:
            from cooperativeimagecaptioning_tpu import parallel
            cache = parallel.replicate(cache, self.mesh)
        if "att" in cache:
            cache["_att_sig"] = sig if sig is not None \
                else self._att_cache_sig()
        return cache

    # -- schedules -----------------------------------------------------------
    def _update_schedules(self):
        opt, epoch = self.opt, self.epoch
        opt.current_lr = schedules.current_lr(opt, epoch)
        opt.ss_prob = schedules.scheduled_sampling_prob(opt, epoch)
        self._retrieval_w = schedules.retrieval_reward_weight(opt, epoch)
        self._pg, self._pm = schedules.soft_sampling_probs(
            opt, epoch, self.epoch_start)
        self.optim.set_lr(opt.current_lr)

    def _hyper(self):
        hp = joint.Hyper.from_opt(self.opt)
        return hp._replace(
            ss_prob=jnp.float32(self.opt.ss_prob),
            gumbel_temp=jnp.float32(self.gumbel_temp),
            retrieval_reward_weight=jnp.float32(self._retrieval_w),
            prob_gumbel_softmax=jnp.float32(self._pg),
            prob_multinomial_soft=jnp.float32(self._pm),
            vse_max_w=jnp.float32(
                schedules.vse_max_violation_w(self.opt, self.iteration)))

    def _fns(self, turn):
        if turn not in self._step_fns:
            self._step_fns[turn] = joint.make_step_fns(self.opt, turn)
        return self._step_fns[turn]

    @staticmethod
    def _batch_arrays(data, use_att):
        batch = {"fc_feats": jnp.asarray(data["fc_feats"]),
                 "labels": jnp.asarray(data["labels"]),
                 "masks": jnp.asarray(data["masks"])}
        if use_att and data.get("att_feats") is not None:
            batch["att_feats"] = jnp.asarray(data["att_feats"])
            batch["att_masks"] = (jnp.asarray(data["att_masks"])
                                  if data.get("att_masks") is not None else None)
        else:
            batch["att_feats"] = None
            batch["att_masks"] = None
        return batch

    def _prepare_batch(self, data):
        """Host batch dict -> device arrays (+ reward refs, mesh shardings)."""
        opt = self.opt
        batch = self._batch_arrays(data, opt.use_att)
        if self._feat_cache is not None and data.get("infos"):
            # device gather from the HBM-resident cache (rows are per-image,
            # seq_per_img consecutive — the _assemble layout)
            idx = jnp.asarray(np.repeat(
                [i["ix"] for i in data["infos"]], self.loader.seq_per_img),
                jnp.int32)
            batch["fc_feats"] = jnp.take(self._feat_cache["fc"], idx, axis=0)
            if opt.use_att and "att" in self._feat_cache:
                batch["att_feats"] = jnp.take(
                    self._feat_cache["att"], idx, axis=0).astype(jnp.float32)
                batch["att_masks"] = jnp.take(
                    self._feat_cache["att_mask"], idx, axis=0)
        if joint.needs_device_refs(opt) and joint._cider_active(
                opt, "optimizer") and data.get("gts"):
            from cooperativeimagecaptioning_tpu.rewards import ngram_device
            batch["refs"], batch["ref_mask"] = ngram_device.pad_gts(
                data["gts"], seq_length=self.loader.seq_length)
        if self.mesh is not None:
            from cooperativeimagecaptioning_tpu import parallel
            batch = parallel.shard_batch(batch, self.mesh)
        if self._df_table is not None and "refs" in batch:
            # already replicated on the mesh at load time (committed, so
            # shard_batch's equivalence check passes it through untouched)
            batch["df_table"] = self._df_table
        return batch

    def close(self):
        """Stop background machinery (the loader's prefetch thread, if any)
        and deregister process-global state this Trainer installed (the
        vocab-sharded kernel mesh — leaking it re-routes later single-chip
        head dispatches through shard_map)."""
        closer = getattr(self.loader, "close", None)
        if closer is not None:
            closer()
        if self.mesh is not None and int(getattr(
                self.opt, "mesh_model_axis", 1) or 1) > 1:
            from cooperativeimagecaptioning_tpu.ops.pallas import _dispatch
            vm = _dispatch.vocab_mesh()
            if vm is not None and vm[0] is self.mesh:
                _dispatch.set_vocab_mesh(None)

    def _shard_reward(self, reward):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(reward, NamedSharding(self.mesh, P("data")))

    def _eval_params(self):
        """Params for the evaluator.  With a single-host mesh the Evaluator
        runs GSPMD-partitioned on the mesh itself, so the sharded params pass
        through; on a multi-host mesh (not fully addressable) they would need
        gathering — detect and gather defensively."""
        if self.mesh is None:
            return self.params
        if all(d.process_index == jax.process_index()
               for d in self.mesh.devices.flat):
            return self.params
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), self.params)

    # -- one iteration ---------------------------------------------------------
    def train_iteration(self, data=None):
        opt = self.opt
        turn = self.turns[self.iteration % len(self.turns)] \
            if opt.is_alternating else "optimizer"

        # schedule maintenance (ref: train.py:416-435)
        if schedules.should_anneal(opt, self.iteration):
            self.gumbel_temp = schedules.anneal_gumbel_temp(
                self.gumbel_temp, opt, self.iteration)
        if opt.softmax_cooling_decay_factor > 0:
            self._pg, self._pm = schedules.soft_sampling_probs(
                opt, self.epoch, self.epoch_start)

        if data is None:
            data = self.loader.get_batch("train")
        # NOTE: no background "device prefetch" thread here on purpose — JAX's
        # async dispatch already overlaps this host-side prep with the device
        # executing the in-flight previous steps (nothing below forces a host
        # sync); a measured attempt at a prefetch thread was 1.7x SLOWER from
        # GIL contention with the dispatch path.  Host-side file IO overlap
        # belongs in the loader's own prefetcher (data/loader.py).
        batch = self._prepare_batch(data)
        hp = self._hyper()
        self._rng, rng = jax.random.split(self._rng)

        sample_fn, grad_fn = self._fns(turn)
        B = data["labels"].shape[0]
        reward = jnp.zeros((B,), jnp.float32)
        if self.mesh is not None:
            reward = self._shard_reward(reward)
        aux_host = {}
        if joint.needs_reward(opt, turn):
            gen, greedy = sample_fn(self.params, batch, rng, hp)
            if opt.use_gen_cider_scores:
                cg, scores, cider_greedy = \
                    self_critical.get_self_critical_reward(
                        data["gts"], np.asarray(gen), np.asarray(greedy),
                        return_gen_scores=True)
                reward_np = cg
            else:
                scores, cider_greedy = self_critical.get_self_critical_reward(
                    data["gts"], np.asarray(gen), np.asarray(greedy))
                reward_np = scores
            reward = jnp.asarray(reward_np, jnp.float32)
            if self.mesh is not None:
                reward = self._shard_reward(reward)
            aux_host["avg_reward"] = float(np.mean(scores))
            aux_host["cider_greedy"] = float(cider_greedy)

        (loss, aux), grads = grad_fn(self.params, batch, rng, hp, reward)
        # non-finite guard runs on DEVICE inside the optimizer update (a bad
        # step leaves params + Adam state untouched); nothing here forces a
        # host sync, so iterations pipeline on the device
        prev_params = self.params  # free snapshot (functional update)
        self.params = self.optim.step(self.params, grads, turn)
        if getattr(opt, "audit_grad_isolation", 0):
            from cooperativeimagecaptioning_tpu.training import audit
            from cooperativeimagecaptioning_tpu.training.optim import \
                agents_to_update
            # a step the non-finite guard rejected legitimately leaves every
            # agent unchanged — auditing it would raise a false UpdateError
            # (the audit already host-syncs, so reading the flag is free here)
            if bool(self.optim.last_step_ok):
                audit.audit_update(
                    prev_params, self.params,
                    tuple(a for a in agents_to_update(opt, turn)
                          if a in self.params))

        # BN running-stat EMA (torch train-mode BatchNorm1d semantics): the
        # functional forward normalizes with batch stats under train=True;
        # the running stats eval/serving uses are tracked here, once per
        # iteration (ref: the train()-mode forward updates them implicitly)
        if getattr(opt, "use_bn", 0) and batch.get("att_feats") is not None \
                and "speaker" in self.params \
                and "att_bn" in self.params["speaker"]:
            from cooperativeimagecaptioning_tpu.models import att_model
            sp_new = att_model.bn_running_update(
                self.params["speaker"], batch["att_feats"],
                batch.get("att_masks"))
            if self.mesh is not None:
                old_bn = self.params["speaker"]["att_bn"]
                sp_new["att_bn"] = {
                    k: jax.device_put(v, old_bn[k].sharding)
                    if k in old_bn else v
                    for k, v in sp_new["att_bn"].items()}
            self.params = {**self.params, "speaker": sp_new}

        loss_dict = dict(aux)  # device scalars; converted lazily by loggers
        loss_dict.update(aux_host)
        loss_dict["loss"] = loss

        # iteration/epoch bookkeeping (ref: train.py:229-235)
        self.iteration += 1
        # loss/lr/ss histories recorded HERE so every driver of
        # train_iteration (showcase, library users) gets the reference's
        # histories pkl (ref train.py:238-244), not just self.train().
        # Values stay device scalars; converted once at checkpoint save.
        if self.iteration % opt.losses_log_every == 0:
            self.loss_history[self.iteration] = loss_dict["loss"]
            self.lr_history[self.iteration] = opt.current_lr
            self.ss_prob_history[self.iteration] = opt.ss_prob
        if data["bounds"]["wrapped"]:
            self.epoch += 1
            self._update_schedules()
        return loss_dict, turn, data

    # -- fused multi-step execution (TPU-native extension; no reference
    # analog).  K iterations compile into ONE lax.scan program: one dispatch
    # and one stacked host->device transfer per chunk instead of per step.
    # Measured on v5e through the tunnel at B=128 full dims: MLE 42 -> 155
    # it/s, joint gumbel + on-device CIDEr 40 -> 60 it/s
    # (scripts/bench_fused_steps.py). ------------------------------------------
    def _fused_gate(self):
        """Why the fused multi-step path can't run (None = it can).

        Every fallback is a per-step host interaction the scan cannot carry:
        the host CIDEr reward, reinforce's per-iteration turn flip (two
        different step graphs), BN running-stat tracking, the grad-isolation
        audit, and the profiler window's iteration boundaries."""
        opt = self.opt
        if int(getattr(opt, "fused_steps", 1) or 1) <= 1:
            return "off"
        if opt.is_alternating and len(self.turns) != 1:
            return "reinforce turn alternation changes the step graph " \
                   "per iteration"
        turn = self.turns[0] if opt.is_alternating else "optimizer"
        if joint.needs_reward(opt, turn):
            return "host-side reward stage (use --on_device_cider 1)"
        if getattr(opt, "use_bn", 0):
            return "BN running-stat tracking updates per step on host"
        if getattr(opt, "audit_grad_isolation", 0):
            return "grad-isolation audit host-syncs per step"
        if getattr(opt, "profile_dir", ""):
            return "profiler window needs per-step boundaries"
        if self._feat_cache is None:
            return "requires --device_feature_cache 1 (per-step feature " \
                   "streaming would dominate the fused step)"
        if opt.use_att and "att" not in self._feat_cache:
            return "att features missing from the device cache"
        return None

    def _hyper_row(self, epoch, g_temp, iteration):
        """One step's Hyper values as HOST floats (field order = joint.Hyper).
        Pure in (epoch, g_temp, iteration) exactly like _update_schedules +
        train_iteration's per-step recomputes, so staging K steps ahead
        reproduces the per-step schedule bit-for-bit."""
        opt = self.opt
        pg, pm = schedules.soft_sampling_probs(opt, epoch, self.epoch_start)
        return (schedules.scheduled_sampling_prob(opt, epoch), g_temp,
                opt.multinomial_temp, pg, pm, opt.caption_loss_weight,
                opt.vse_loss_weight,
                schedules.retrieval_reward_weight(opt, epoch),
                opt.cider_optimization,
                schedules.vse_max_violation_w(opt, iteration))

    def _stage_chunk(self, max_steps):
        """Fetch up to max_steps train batches and precompute every step's
        schedule values on host.  Stops early when a wrap reaches max_epochs
        (train() must observe the break right after that iteration)."""
        opt, loader = self.opt, self.loader
        turn = self.turns[0] if opt.is_alternating else "optimizer"
        want_refs = joint.needs_device_refs(opt) and \
            joint._cider_active(opt, turn)
        labels, masks, idxs, gts_all = [], [], [], []
        hp_rows, lrs = [], []
        epoch, g_temp, wraps = self.epoch, self.gumbel_temp, 0
        last_data = None
        for j in range(max_steps):
            it_j = self.iteration + j
            # mirrors train_iteration's entry order: anneal check on the
            # pre-increment counter, schedules from the CURRENT epoch
            if schedules.should_anneal(opt, it_j):
                g_temp = schedules.anneal_gumbel_temp(g_temp, opt, it_j)
            hp_rows.append(self._hyper_row(epoch, g_temp, it_j))
            lrs.append(schedules.current_lr(opt, epoch))
            data = loader.get_batch("train")
            last_data = data
            labels.append(data["labels"])
            masks.append(data["masks"])
            idxs.append(np.asarray([i["ix"] for i in data["infos"]],
                                   np.int32))
            if want_refs and data.get("gts"):
                gts_all.append(data["gts"])
            if data["bounds"]["wrapped"]:
                epoch += 1
                wraps += 1
                if epoch >= opt.max_epochs != -1:
                    break
        K = len(labels)
        st = {"n_steps": K, "turn": turn, "wraps": wraps, "g_temp": g_temp,
              "last_data": last_data,
              "lrs": lrs, "ss": [r[0] for r in hp_rows]}
        xs = {"labels": np.stack(labels).astype(np.int32),
              # masks/ref_mask are exact {0,1}: stage uint8, cast in-scan
              "masks": np.stack(masks).astype(np.uint8),
              "idx": np.stack(idxs),
              "lr": np.asarray(lrs, np.float32),
              "hp": joint.Hyper(*(np.asarray(c, np.float32)
                                  for c in zip(*hp_rows)))}
        if gts_all:
            from cooperativeimagecaptioning_tpu.rewards import ngram_device
            R = max(len(g) for gts in gts_all for g in gts)
            pairs = [ngram_device.pad_gts_np(g, max_refs=R,
                                             seq_length=loader.seq_length)
                     for g in gts_all]
            xs["refs"] = np.stack([p[0] for p in pairs])
            xs["ref_mask"] = np.stack([p[1] for p in pairs]).astype(np.uint8)
        st["xs"] = xs
        return st

    def _chunk_fn(self, turn):
        """Jitted K-step scan: carry (params, opt states, rng), consume the
        stacked per-step inputs, reproduce train_iteration's device work
        (cache gather -> grad -> per-step lr injection -> guarded update)."""
        if turn in self._chunk_fns:
            return self._chunk_fns[turn]
        from cooperativeimagecaptioning_tpu.training.optim import (
            agents_to_update, guarded_update)
        opt = self.opt
        _, raw_grad = joint.make_raw_fns(opt, turn)
        txs = self.optim.txs
        agents = tuple(a for a in agents_to_update(opt, turn)
                       if a in self.params)
        spi = self.loader.seq_per_img
        use_att = bool(opt.use_att)

        def run_chunk(params, states, rng, cache, df_table, xs):
            def body(carry, x):
                params, states, rng = carry
                rng, step_rng = jax.random.split(rng)
                rows = jnp.repeat(x["idx"], spi, axis=0)
                batch = {"fc_feats": jnp.take(cache["fc"], rows, axis=0),
                         "labels": x["labels"],
                         "masks": x["masks"].astype(jnp.float32),
                         "att_feats": None, "att_masks": None}
                if use_att:
                    batch["att_feats"] = jnp.take(
                        cache["att"], rows, axis=0).astype(jnp.float32)
                    batch["att_masks"] = jnp.take(
                        cache["att_mask"], rows, axis=0)
                if "refs" in x:
                    batch["refs"] = x["refs"]
                    batch["ref_mask"] = x["ref_mask"].astype(jnp.float32)
                if df_table is not None:
                    batch["df_table"] = df_table
                # per-step epoch-decayed lr, injected exactly where set_lr
                # puts it on the per-step path
                states = {a: s._replace(hyperparams=dict(
                    s.hyperparams, learning_rate=x["lr"]))
                    for a, s in states.items()}
                reward = jnp.zeros((x["labels"].shape[0],), jnp.float32)
                (loss, aux), grads = raw_grad(params, batch, step_rng,
                                              x["hp"], reward)
                params, states, ok = guarded_update(
                    txs, params, grads, states, agents)
                return (params, states, rng), (loss, aux, ok)
            (params, states, rng), (losses, auxs, oks) = jax.lax.scan(
                body, (params, states, rng), xs)
            return params, states, rng, losses, auxs, oks

        fn = jax.jit(run_chunk)
        self._chunk_fns[turn] = fn
        return fn

    def train_chunk(self, max_steps):
        """Run up to max_steps iterations as one compiled scan.  Semantics
        match per-step train_iteration: same PRNG stream (carried split),
        same schedule values, same guarded update and histories cadence.
        Returns (loss_dict_of_last_step, turn, last_data, n_steps)."""
        opt = self.opt
        st = self._stage_chunk(max_steps)
        K, turn = st["n_steps"], st["turn"]
        xs = {k: jnp.asarray(v) if not isinstance(v, joint.Hyper)
              else jax.tree.map(jnp.asarray, v) for k, v in st["xs"].items()}
        if self.mesh is not None:
            from cooperativeimagecaptioning_tpu import parallel
            xs = parallel.shard_batch_stacked(xs, self.mesh)
        cache = {k: self._feat_cache[k]
                 for k in ("fc", "att", "att_mask") if k in self._feat_cache}
        fn = self._chunk_fn(turn)
        params, states, rng, losses, auxs, oks = fn(
            self.params, self.optim.states, self._rng, cache,
            self._df_table, xs)
        self.params = params
        self.optim.load_state_dict(states)
        self._rng = rng
        self.optim.last_step_ok = oks[-1]
        self.optim._skipped = self.optim._skipped + (
            K - jnp.sum(oks.astype(jnp.int32)))

        # histories at the per-step cadence (device slices, converted lazily
        # at checkpoint time like the per-step path)
        for j in range(K):
            it_j = self.iteration + j + 1
            if it_j % opt.losses_log_every == 0:
                self.loss_history[it_j] = losses[j]
                self.lr_history[it_j] = st["lrs"][j]
                self.ss_prob_history[it_j] = st["ss"][j]
        self.iteration += K
        self.epoch += st["wraps"]
        self.gumbel_temp = st["g_temp"]
        self._update_schedules()

        loss_dict = {k: v[-1] for k, v in auxs.items()}
        loss_dict["loss"] = losses[-1]
        return loss_dict, turn, st["last_data"], K

    # -- checkpoint ops (ref: train.py:438-470) --------------------------------
    def evaluator(self):
        if self._evaluator is None:
            from cooperativeimagecaptioning_tpu.evaluation.eval_split import \
                Evaluator
            mesh = self.mesh if self.mesh is not None and all(
                d.process_index == jax.process_index()
                for d in self.mesh.devices.flat) else None
            # the HBM feature cache covers ALL images (built over range(N)),
            # so checkpoint evals gather val/test features on device too —
            # streaming them per eval batch over a thin host link costs more
            # than the eval compute at protocol scale (5000 images ~ 1.5 GB)
            self._evaluator = Evaluator(self.opt, mesh=mesh,
                                        feat_cache=self._feat_cache)
            if self._feat_cache is not None:
                for s in ("val", "test"):
                    self.loader.set_feature_free(s)
        return self._evaluator

    def checkpoint_operations(self):
        opt = self.opt
        ev = self.evaluator()
        eval_kwargs = {"split": "val", "dataset": opt.input_json}
        eval_kwargs.update(vars(opt))
        val_loss, predictions, lang_stats = ev.eval_split(
            self._eval_params(), self.loader, eval_kwargs,
            use_gen_sent=opt.rank_on_gen_captions)
        self.val_result_history[self.iteration] = {
            "loss": val_loss, "lang_stats": lang_stats,
            "predictions": predictions}

        skipped = self.optim.skipped_steps()
        if skipped:
            # the device-side non-finite guard rejected steps since start;
            # surface it here (one host sync per checkpoint, not per step)
            print(f"warning: non-finite guard skipped {skipped} update steps")
        self.val_result_history[self.iteration]["skipped_steps"] = skipped

        current_score, current_score_vse = self._current_scores(
            lang_stats, val_loss)
        best_flag = self.best_val_score is None or \
            current_score > self.best_val_score
        if best_flag:
            self.best_val_score = current_score
        best_flag_vse = self.best_val_score_vse is None or \
            current_score_vse > self.best_val_score_vse
        if best_flag_vse:
            self.best_val_score_vse = current_score_vse

        self.ckpt.save_model(self.params, self.iteration)
        self.ckpt.save_optimizers(self.optim)
        infos = self.infos
        res_it, res_six = self.loader.resume_state()
        infos.update({"iter": self.iteration, "epoch": self.epoch,
                      "iterators": res_it,
                      "split_ix": res_six,
                      "best_val_score": self.best_val_score,
                      "best_val_score_vse": self.best_val_score_vse,
                      "opt": self.opt, "vocab": self.loader.get_vocab(),
                      "gumbel_temp": self.gumbel_temp})
        # device scalars accumulated by train_iteration -> host floats once
        self.loss_history = {k: float(v) for k, v in self.loss_history.items()}
        histories = self.histories
        histories.update({"val_result_history": self.val_result_history,
                          "loss_history": self.loss_history,
                          "lr_history": self.lr_history,
                          "ss_prob_history": self.ss_prob_history})
        self.ckpt.save_infos(infos, self.iteration)
        self.ckpt.save_histories(histories)
        if best_flag:
            self.ckpt.save_best(self.params)
            self.ckpt.save_best_infos(infos)
        if best_flag_vse:
            self.ckpt.save_best(self.params, vse=True)
            self.ckpt.save_best_infos(infos, vse=True)
        return val_loss, lang_stats

    def _current_scores(self, lang_stats, val_loss):
        """ref: train.py:262-282."""
        opt = self.opt
        if opt.language_eval == 1:
            if opt.phase == 1:
                current = lang_stats.get("val", {}).get("CIDEr", 0)
            else:
                current = lang_stats.get("CIDEr", 0)
        else:
            current = 0 if opt.phase == 1 else -val_loss.get("loss_cap", 0.0)
        crit = opt.vse_eval_criterion
        if crit in val_loss:
            vse_score = val_loss[crit] * 100
        elif isinstance(val_loss.get("val"), dict):
            vse_score = val_loss["val"].get(crit, 0) * 100  # phase-1 nesting
        else:
            vse_score = 0
        return current, vse_score

    # -- full loop (ref: train.py:473-562) --------------------------------------
    def train(self, max_iterations=None):
        opt = self.opt
        profiling = False
        fused_gate = self._fused_gate()
        if int(getattr(opt, "fused_steps", 1) or 1) > 1 and fused_gate and \
                self.verbose and self._fused_notice != fused_gate:
            print(f"fused_steps={opt.fused_steps} requested but falling back "
                  f"to per-step execution: {fused_gate}")
            self._fused_notice = fused_gate
        while True:
            # profiler window (SURVEY.md §5.1; --profile_dir/--profile_start)
            if getattr(opt, "profile_dir", "") and not profiling and \
                    self.iteration == opt.profile_start:
                jax.profiler.start_trace(opt.profile_dir)
                profiling = True
                profile_stop = self.iteration + opt.profile_steps
            start = time.time()
            if fused_gate is None:
                # chunk never crosses a checkpoint boundary or max_iterations
                chunk = min(int(opt.fused_steps),
                            opt.save_checkpoint_every -
                            (self.iteration % opt.save_checkpoint_every))
                if max_iterations is not None:
                    chunk = min(chunk, max_iterations - self.iteration)
                if opt.start_with_checkpoint:
                    chunk = 1  # the forced first checkpoint fires after it
                loss_dict, turn, data, n_steps = self.train_chunk(
                    max(1, chunk))
            else:
                loss_dict, turn, data = self.train_iteration()
                n_steps = 1
            if profiling and self.iteration >= profile_stop:
                jax.profiler.stop_trace()
                profiling = False
            if self.verbose:
                dur = time.time() - start
                msg = " ".join(f"{k} = {round(float(v), 2)}"
                               for k, v in sorted(loss_dict.items()))
                span = f"iter {self.iteration}" if n_steps == 1 else \
                    f"iter {self.iteration - n_steps + 1}-{self.iteration}"
                print(f"{span} (epoch {self.epoch}) [{turn}] "
                      f"{msg} time/batch = {dur / n_steps:.2f}s")
            if self.iteration % opt.save_checkpoint_every == 0 or \
                    opt.start_with_checkpoint:
                self.checkpoint_operations()
                opt.start_with_checkpoint = 0
            if max_iterations is not None and \
                    self.iteration >= max_iterations:
                break
            if self.epoch >= opt.max_epochs != -1:
                if self.verbose:
                    print("Finished training")
                break
        self.close()
        return self.params


def train(opt, dataset=None, max_iterations=None):
    """Top-level entry (ref: train.py:473)."""
    trainer = Trainer(opt, dataset=dataset)
    trainer.train(max_iterations=max_iterations)
    return trainer
