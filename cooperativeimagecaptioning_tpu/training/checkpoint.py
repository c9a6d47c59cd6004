"""Checkpoint manager honoring the reference artifact taxonomy (SURVEY.md §5.4).

Per run directory (opt.checkpoint_path):
  model.pth / alternatingModel.pth (+ -<iter> variants, -best, model_vse-best)
      -> pickled numpy param trees            (ref: train.py:121-129, 299-306)
  optimizer.pth / {speaker,listener}_optimizer.pth
      -> pickled numpy optax states           (ref: optimizer.py:191-221)
  infos_<id>.pkl (+ -<iter>, -best), histories_<id>.pkl
      -> same keys as the reference           (ref: train.py:309-347)

File contents are framework-native (numpy pytrees, not torch state_dicts) but the
file layout, naming, and resume semantics are preserved so experiment tooling
written against the reference keeps working.

TPU-native tier: `--checkpoint_backend orbax` stores the model trees through
orbax (async writes overlap with training; atomic directory commits;
restores honor the live params' shardings, so a mesh Trainer resumes without
a host gather). Artifact names keep the taxonomy with an `.orbax` directory
suffix (alternatingModel.orbax, model-best.orbax, ...); optimizer states and
infos/histories pickles are small and stay in the reference format.
"""

from __future__ import annotations

import os
import pickle

import chex
import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def save_params(params, path):
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(params), f)


def load_params(path):
    with open(path, "rb") as f:
        return _to_jax(pickle.load(f))


def _orbax_sibling(path):
    """The .orbax directory an orbax-backend save would have used for `path`,
    or None if there isn't one on disk."""
    if path.endswith(".pth"):
        opath = os.path.abspath(path[:-4] + ".orbax")
        if os.path.isdir(opath):
            return opath
    return None


def load_params_into(params, path, strict=False):
    """Lenient merge like ref misc/utils.py:89-107: copy overlapping leaves,
    report mismatches, keep the rest.  Falls back to the `.orbax` sibling of a
    missing .pth so eval/harvest work on --checkpoint_backend orbax runs."""
    opath = None if os.path.isfile(path) else _orbax_sibling(path)
    if opath is not None:
        # restore the tree AS SAVED (no abstract target) and route it through
        # the same lenient merge as the .pth path, so a structure mismatch —
        # e.g. a speaker-only checkpoint loaded into speaker+listener params
        # by eval.py's gt-listener flow — copies overlapping leaves instead of
        # raising
        import orbax.checkpoint as ocp
        loaded = ocp.StandardCheckpointer().restore(opath)
    else:
        loaded = load_params(path)

    def merge(cur, new, prefix=""):
        if isinstance(cur, dict):
            out = {}
            for k, v in cur.items():
                if isinstance(new, dict) and k in new:
                    out[k] = merge(v, new[k], prefix + k + ".")
                else:
                    if strict:
                        raise KeyError(f"missing key {prefix + k} in checkpoint")
                    print(f"key {prefix + k} not in loaded checkpoint")
                    out[k] = v
            for k in (new or {}):
                if k not in cur:
                    print(f"key {prefix + k} in checkpoint not in model")
            return out
        if hasattr(new, "shape") and tuple(new.shape) != tuple(cur.shape):
            print(f"key {prefix[:-1]} size mismatch "
                  f"{tuple(new.shape)} vs {tuple(cur.shape)}; flatten-copy")
            flat_new = np.asarray(new).reshape(-1)
            flat_cur = np.array(cur).reshape(-1)
            n = min(flat_new.size, flat_cur.size)
            flat_cur[:n] = flat_new[:n]
            return jnp.asarray(flat_cur.reshape(np.asarray(cur).shape))
        return jnp.asarray(new)

    return merge(params, loaded)


def model_filename(opt, iteration=None, best=False, vse_best=False):
    kind = "alternatingModel" if opt.is_alternating else "model"
    if vse_best:
        return "model_vse-best.pth"
    if best:
        return "model-best.pth"
    if iteration is not None:
        return f"{kind}-{iteration}.pth"
    return f"{kind}.pth"


def save_pkl(checkpoint_path, run_id, file_name, payload, iteration=None,
             best=False):
    """ref: train.py:95-118."""
    assert not (iteration is not None and best)
    ext = f"-{iteration}" if iteration is not None else ("-best" if best else "")
    path = os.path.join(checkpoint_path, f"{file_name}_{run_id}{ext}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


class CheckpointManager:
    def __init__(self, opt):
        self.opt = opt
        self.backend = getattr(opt, "checkpoint_backend", "pth") or "pth"
        self._orbax = None
        os.makedirs(opt.checkpoint_path, exist_ok=True)

    # -- orbax tier -----------------------------------------------------------
    def _orbax_ckptr(self):
        if self._orbax is None:
            import orbax.checkpoint as ocp
            self._orbax = ocp.StandardCheckpointer()
        return self._orbax

    @staticmethod
    def _orbax_path(pth_path):
        return os.path.abspath(pth_path[:-4] + ".orbax")

    def _save_tree(self, params, pth_path):
        if self.backend == "orbax":
            ck = self._orbax_ckptr()
            ck.wait_until_finished()  # serialize with the previous async save
            ck.save(self._orbax_path(pth_path), params, force=True)
        else:
            save_params(params, pth_path)

    def _try_restore_tree(self, params, pth_path):
        """Restore into the structure/shardings of `params`; None if absent."""
        opath = self._orbax_path(pth_path)
        if self.backend == "orbax" and os.path.isdir(opath):
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x),
                    sharding=getattr(x, "sharding", None)), params)
            return self._orbax_ckptr().restore(opath, abstract)
        if os.path.isfile(pth_path):
            return load_params_into(params, pth_path)
        return None

    def sync(self):
        """Block until pending async (orbax) writes commit."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def save_model(self, params, iteration=None):
        """ref: train.py:121-129 (always latest; plus per-iteration copy)."""
        base = os.path.join(self.opt.checkpoint_path,
                            model_filename(self.opt))
        self._save_tree(params, base)
        if iteration is not None:
            self._save_tree(params, os.path.join(
                self.opt.checkpoint_path,
                model_filename(self.opt, iteration=iteration)))

    def save_best(self, params, vse=False):
        self._save_tree(params, os.path.join(
            self.opt.checkpoint_path,
            model_filename(self.opt, best=not vse, vse_best=vse)))

    def save_optimizers(self, optim_manager):
        """ref: optimizer.py:191-221 naming."""
        states = _to_numpy(optim_manager.state_dict())
        if self.opt.is_alternating:
            for agent, st in states.items():
                with open(os.path.join(self.opt.checkpoint_path,
                                       f"{agent}_optimizer.pth"), "wb") as f:
                    pickle.dump(st, f)
        else:
            agent = "listener" if self.opt.phase == 1 else "speaker"
            st = states.get(agent, next(iter(states.values())))
            with open(os.path.join(self.opt.checkpoint_path,
                                   "optimizer.pth"), "wb") as f:
                pickle.dump(st, f)

    def load_optimizers(self, optim_manager):
        """Restore per-agent Adam states saved by save_optimizers (the
        reference's load_optimizer, optimizer.py:149-188).  Lenient: agents
        without a saved file keep their fresh state."""
        sf = self.opt.start_from
        if not sf:
            return False
        restored = False
        states = optim_manager.state_dict()
        for agent in list(states):
            cands = [f"{agent}_optimizer.pth"]
            if not self.opt.is_alternating and agent == (
                    "listener" if self.opt.phase == 1 else "speaker"):
                # the non-alternating optimizer.pth holds exactly ONE
                # agent's state — the phase's trained agent (mirrors
                # save_optimizers); matching it against the other agent
                # produced a spurious "different structure" warning
                cands.append("optimizer.pth")
            for name in cands:
                path = os.path.join(sf, name)
                if os.path.isfile(path):
                    with open(path, "rb") as f:
                        st = pickle.load(f)
                    try:
                        chex.assert_trees_all_equal_shapes(
                            _to_numpy(states[agent]), st)
                    except (AssertionError, ValueError):
                        print(f"optimizer state for {agent} in {name} has a "
                              "different structure; keeping fresh state")
                        break
                    states = dict(states)
                    states[agent] = _to_jax(st)
                    restored = True
                    break
        if restored:
            optim_manager.load_state_dict(states)
        return restored

    def load_agent_optimizer(self, optim_manager, agent, path):
        """Seed ONE agent's Adam state from a saved optimizer .pth — the
        reference's cross-stage wiring (--speaker_stage_2_optimizer_path,
        optimizer.py:49-96).  Lenient on structure mismatch."""
        if not os.path.isfile(path):
            return False
        with open(path, "rb") as f:
            st = pickle.load(f)
        states = dict(optim_manager.state_dict())
        try:
            chex.assert_trees_all_equal_shapes(_to_numpy(states[agent]), st)
        except (AssertionError, ValueError, KeyError):
            print(f"stage-2 optimizer state at {path} does not match the "
                  f"{agent} params; keeping fresh state")
            return False
        states[agent] = _to_jax(st)
        optim_manager.load_state_dict(states)
        return True

    def save_infos(self, infos, iteration):
        args = (self.opt.checkpoint_path, self.opt.id)
        save_pkl(*args, "infos", infos)
        save_pkl(*args, "infos", infos, iteration=iteration)

    def save_histories(self, histories):
        save_pkl(self.opt.checkpoint_path, self.opt.id, "histories", histories)

    def save_best_infos(self, infos, vse=False):
        save_pkl(self.opt.checkpoint_path, self.opt.id,
                 "infos_vse" if vse else "infos", infos, best=True)

    # -- resume --------------------------------------------------------------
    def try_load_model(self, params, iteration=None):
        sf = self.opt.start_from
        if not sf:
            return params, False
        kind = "alternatingModel" if self.opt.is_alternating else "model"
        name = f"{kind}-{iteration}.pth" if iteration is not None \
            else f"{kind}.pth"
        path = os.path.join(sf, name)
        restored = self._try_restore_tree(params, path)
        if restored is not None:
            return restored, True
        return params, False

    def load_infos(self):
        """ref: train.py:143-159 with opt-compatibility asserts."""
        sf = self.opt.start_from
        if not sf:
            return {}
        path = os.path.join(sf, f"infos_{self.opt.id}.pkl")
        if not os.path.isfile(path):
            return {}
        infos = load_pkl(path)
        saved = infos.get("opt")
        if saved is not None:
            for k in ("caption_model", "rnn_type", "rnn_size", "num_layers"):
                assert vars(saved)[k] == vars(self.opt)[k], \
                    f"Command line argument and saved model disagree on '{k}'"
        return infos

    def load_histories(self):
        sf = self.opt.start_from
        if not sf:
            return {}
        path = os.path.join(sf, f"histories_{self.opt.id}.pkl")
        return load_pkl(path) if os.path.isfile(path) else {}
