"""Checkpointing: best/latest saver plus torch .pt interchange.

- ModuleSaver equivalent (PCONV_operator/ModuleSaver.py:4-35): keeps
  `{prex}_best_{i}.pt`-style files per tracked loss, `{prex}_latest` else.
- The reference ships split checkpoints `{idx}_{ch}_{encoder,decoder,ent}.pt`
  merged at load (pseudo_codec.py:223-227); converters below map those torch
  state dicts onto our nested param dicts (whose keys mirror the torch module
  names) and back.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_params(params, path: str):
    with open(path, "wb") as f:
        pickle.dump(_to_numpy_tree(params), f)


def load_params(path: str):
    with open(path, "rb") as f:
        tree = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, tree)


def save_params_orbax(params, path: str):
    """Orbax checkpoint (async-safe, multi-host-aware) alternative to the
    pickle format; use for sharded training state."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), _to_numpy_tree(params))


def load_params_orbax(path: str):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    return jax.tree_util.tree_map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# Full training-state persistence
# ---------------------------------------------------------------------------
#
# The reference checkpoints the quantizer usage histogram `count` as a model
# parameter (PCONV_operator/PseudoContextV2.py:250), so a resumed run keeps
# its bin-merge statistics. Saving `params` alone (the round-2 behavior)
# silently reset `count` and both Adam states on --resume, diverging from an
# uninterrupted run. These helpers persist the complete TrainState.

_STATE_KEYS = ("params", "count", "opt_other", "opt_ent", "step")
_STATE_MARK = "__train_state__"


def save_train_state(state, path: str):
    """Persist the full TrainState (params + quant count + both optimizer
    states + step) so --resume exactly continues an interrupted run."""
    tree = {k: getattr(state, k) for k in _STATE_KEYS}
    tree[_STATE_MARK] = True
    with open(path, "wb") as f:
        pickle.dump(_to_numpy_tree(tree), f)


def is_train_state_file(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            tree = pickle.load(f)
    except Exception:
        return False
    return isinstance(tree, dict) and bool(tree.get(_STATE_MARK))


def load_train_state(path: str) -> dict:
    """Load a save_train_state file -> dict with keys _STATE_KEYS."""
    with open(path, "rb") as f:
        tree = pickle.load(f)
    if not tree.get(_STATE_MARK):
        raise ValueError(f"{path} is not a train-state checkpoint")
    return jax.tree_util.tree_map(jnp.asarray,
                                  {k: tree[k] for k in _STATE_KEYS})


class ModelSaver:
    """Best/latest checkpoint keeper (ModuleSaver semantics).

    Params-only .pkl files keep the codec-loadable format; when the caller
    passes the full TrainState, `{prefix}_trainstate.pkl` additionally
    tracks the complete resumable state every save."""

    def __init__(self, path: str = "./saved_models/", prefix: str = "default",
                 resume: bool = False):
        self.path = path
        self.prefix = prefix
        os.makedirs(path, exist_ok=True)
        self.best = None
        # best-loss memory persists across processes so segmented/resumed
        # training (each segment is a fresh invocation) can't let a worse
        # later epoch clobber {prefix}_best_i.pkl — but ONLY for resumed
        # runs. A fresh run into an existing save_dir resets the memory
        # (the reference ModuleSaver resets per process), otherwise it
        # could finish without ever writing a best checkpoint.
        self._meta = os.path.join(path, f"{prefix}_saver.json")
        if resume and os.path.exists(self._meta):
            with open(self._meta) as f:
                self.best = json.load(f)
        elif not resume and os.path.exists(self._meta):
            os.remove(self._meta)

    def init_loss(self, losses):
        if not isinstance(losses, (list, tuple)):
            losses = [losses]
        self.best = list(losses)

    def save(self, params, losses, state=None) -> str:
        if not isinstance(losses, (list, tuple)):
            losses = [losses]
        if self.best is None:
            self.best = [1e10] * len(losses)
        msg, improved = "", False
        for i, l in enumerate(losses):
            if l < self.best[i]:
                improved = True
                self.best[i] = l
                fn = os.path.join(self.path, f"{self.prefix}_best_{i}.pkl")
                save_params(params, fn)
                msg += f"save {os.path.basename(fn)}\t"
        if not improved:
            fn = os.path.join(self.path, f"{self.prefix}_latest.pkl")
            save_params(params, fn)
            msg = f"update {os.path.basename(fn)}"
        if state is not None:
            save_train_state(state, os.path.join(
                self.path, f"{self.prefix}_trainstate.pkl"))
        with open(self._meta, "w") as f:
            json.dump(self.best, f)
        return msg


# ---------------------------------------------------------------------------
# torch .pt interchange
# ---------------------------------------------------------------------------

def _flat_to_nested(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(np.asarray(val))
    return root


def _nested_to_flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_nested_to_flat(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> dict:
    """Load a torch .pt state dict to a flat {name: np.ndarray} dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def reference_to_params(encoder_sd: dict | None = None,
                        decoder_sd: dict | None = None,
                        ent_sd: dict | None = None,
                        strict: bool = True,
                        template: dict | None = None) -> dict:
    """Map reference checkpoints onto our param tree.

    The reference's codec-side modules are named encoder.* / decoder.* /
    quant.weight (+quant.count) in `{p}_{encoder,decoder}.pt`, and ent.* in
    `{p}_ent.pt` where the entropy conv weights are the batch-fused
    (3, nout, cin, 5, 5) form [weight_net, delta_net, mean_net]
    (EntEncoder at pseudo_codec.py:79-90; thirds order fixed by the GMM batch
    layout, entropy_gmm_table_cuda.cu:135-153).

    With ``strict`` (the default) every input key must be consumed; a
    renamed/unknown key in a user checkpoint raises instead of being
    silently dropped. Pass ``template`` (a freshly-initialized param tree,
    e.g. ``cmpnet_init(...)``) to additionally require the converted tree
    to cover the model's key set exactly — the equivalent of torch's strict
    ``load_state_dict`` (pseudo_codec.py:227): a typo'd key under a known
    prefix would otherwise graft a dead leaf and leave a real one unset. ``quant.count`` (the quantizer usage histogram,
    PseudoContextV2.py:250) is consumed but deliberately NOT placed in the
    returned tree: our framework carries it in TrainState.count, not in
    params — read it from the state dict directly when resuming training.
    """
    params: dict = {}
    flat: dict = {}
    for sd in (encoder_sd, decoder_sd):
        if sd:
            flat.update(sd)
    nested = _flat_to_nested(flat) if flat else {}
    for part in ("encoder", "decoder"):
        if part in nested:
            params[part] = nested[part]
    if "quant" in nested:
        params["quant"] = {"weight": nested["quant"]["weight"]}
    if ent_sd:
        params["ent"] = _fused_ent_to_params(_flat_to_nested(ent_sd)["ent"])
    if strict:
        # every key the converter read must round-trip out of the result;
        # anything left over would have been silently dropped
        consumed = set(_nested_to_flat(
            {k: v for k, v in params.items() if k != "ent"}))
        consumed.add("quant.count")  # -> TrainState.count, see docstring
        leftover = (set(flat) - consumed)
        if ent_sd:
            leftover |= set(ent_sd) - set(train_ent_to_fused(params["ent"]))
        if leftover:
            raise ValueError(
                "reference checkpoint keys not consumed by the converter: "
                + ", ".join(sorted(leftover)[:8])
                + (f" (+{len(leftover)-8} more)" if len(leftover) > 8 else ""))
    if template is not None:
        have = set(_nested_to_flat(params))
        want = {k for k in _nested_to_flat(template)
                if k.split(".")[0] in params}  # only parts that were loaded
        if have != want:
            diff = sorted(have ^ want)
            raise ValueError(
                "converted checkpoint does not match the model's key set: "
                + ", ".join(diff[:8])
                + (f" (+{len(diff)-8} more)" if len(diff) > 8 else ""))
    return params


_SUBNETS = ("weight_net", "delta_net", "mean_net")  # fused batch order


def _fused_ent_to_params(ent):
    """Split batch-fused EntEncoder weights into the three train subnets.

    EntEncoder net layout (pseudo_codec.py:79-87):
      net.0        EntropyConvDBT(cin=1,cout=3)         -> subnet net.0
      net.{1..5}   EntropyResidualBlockDBT(conv1,conv2) -> subnet net.{1..5}
      net.6        EntropyConvDBT(out, act=False)       -> subnet net.6
    Each DBT conv holds weight (3,nout,cin,5,5), bias (3,nout), relu (3,nout).
    """
    out = {s: {"net": {}} for s in _SUBNETS}
    for layer in ("0", "6"):
        conv = ent["net"][layer]["conv"]
        for b, s in enumerate(_SUBNETS):
            p = {"conv": {"weight": conv["weight"][b], "bias": conv["bias"][b]}}
            if "relu" in conv:
                p["act"] = {"weight": conv["relu"][b]}
            out[s]["net"][layer] = p
    for layer in ("1", "2", "3", "4", "5"):
        blk = ent["net"][layer]
        for b, s in enumerate(_SUBNETS):
            out[s]["net"][layer] = {}
            for cn in ("conv1", "conv2"):
                conv = blk[cn]["conv"]
                out[s]["net"][layer][cn] = {
                    "conv": {"weight": conv["weight"][b],
                             "bias": conv["bias"][b]},
                    "act": {"weight": conv["relu"][b]}}
    return out


def train_ent_to_fused(ent_params) -> dict:
    """Inverse: three train-time subnets -> flat fused ent.* state dict."""
    flat = {}

    def stack(getter, name):
        ws = [np.asarray(getter(ent_params[s])) for s in _SUBNETS]
        flat[name] = np.stack(ws, axis=0)

    for layer in ("0", "6"):
        stack(lambda s, l=layer: s["net"][l]["conv"]["weight"],
              f"ent.net.{layer}.conv.weight")
        stack(lambda s, l=layer: s["net"][l]["conv"]["bias"],
              f"ent.net.{layer}.conv.bias")
        if layer == "0":
            stack(lambda s, l=layer: s["net"][l]["act"]["weight"],
                  f"ent.net.{layer}.conv.relu")
    for layer in ("1", "2", "3", "4", "5"):
        for cn in ("conv1", "conv2"):
            stack(lambda s, l=layer, c=cn: s["net"][l][c]["conv"]["weight"],
                  f"ent.net.{layer}.{cn}.conv.weight")
            stack(lambda s, l=layer, c=cn: s["net"][l][c]["conv"]["bias"],
                  f"ent.net.{layer}.{cn}.conv.bias")
            stack(lambda s, l=layer, c=cn: s["net"][l][c]["act"]["weight"],
                  f"ent.net.{layer}.{cn}.conv.relu")
    return flat
