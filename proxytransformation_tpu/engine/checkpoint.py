"""Checkpoint save/restore with auto-resume (orbax-backed).

Parity with the reference's CheckpointHook (interval=1 epoch,
max_keep_ckpts, `--resume auto|path`, warm-start via `load_from`;
reference: configs/...clip.py:226-227, tools/train.py:119-125) plus
PyTorch→JAX weight conversion entry points for the released
checkpoints (models/resnet.py:convert_torch_resnet,
models/text_encoder.py:convert_hf_clip_text).
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(work_dir: str, step: int) -> str:
    return os.path.join(work_dir, f'ckpt_{step:08d}')


def save_checkpoint(work_dir: str, state, epoch: int,
                    max_keep: int = 2, iteration: int = 0) -> str:
    """Save TrainState (+epoch, +mid-epoch iteration) and rotate.

    `iteration` > 0 marks a mid-epoch checkpoint: on resume the runner
    fast-forwards the dataloader past that many consumed batches (the
    reference's FastResumeIterBasedTrainLoop, runner/loops.py:55-67).
    """
    import orbax.checkpoint as ocp
    step = int(state.step)
    path = os.path.abspath(_ckpt_dir(work_dir, step))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats),
        'opt_state': jax.device_get(state.opt_state),
        'step': np.asarray(step),
        'epoch': np.asarray(epoch),
        'iteration': np.asarray(iteration),
    }
    ckptr.save(path, payload, force=True)
    # rotate
    all_ckpts = sorted(list_checkpoints(work_dir))
    for old in all_ckpts[:-max_keep]:
        shutil.rmtree(os.path.join(work_dir, old), ignore_errors=True)
    return path


def list_checkpoints(work_dir: str):
    if not os.path.isdir(work_dir):
        return []
    return [d for d in os.listdir(work_dir)
            if re.fullmatch(r'ckpt_\d+', d)]


def latest_checkpoint(work_dir: str) -> Optional[str]:
    ckpts = sorted(list_checkpoints(work_dir))
    return os.path.join(work_dir, ckpts[-1]) if ckpts else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_state(state, payload: Dict[str, Any]):
    """Restore a TrainState from a checkpoint payload (full resume)."""
    return state.replace(
        step=jax.numpy.asarray(payload['step'], jax.numpy.int32),
        params=payload['params'],
        batch_stats=payload['batch_stats'],
        opt_state=payload['opt_state'])


def warm_start_params(params, payload: Dict[str, Any]):
    """`load_from` semantics: copy matching param leaves only."""
    src = payload['params']

    def merge(dst, s):
        if isinstance(dst, dict) and isinstance(s, dict):
            return {k: merge(v, s[k]) if k in s else v
                    for k, v in dst.items()}
        if hasattr(dst, 'shape') and hasattr(s, 'shape') \
                and dst.shape == s.shape:
            return s
        return dst

    return merge(params, src)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a PyTorch .pth state_dict as numpy arrays (CPU torch)."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in sd.items()}
