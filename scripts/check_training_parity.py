#!/usr/bin/env python
"""Lockstep training-dynamics parity check (CPU, f32 both sides).

Ports the reference torch SiameseUNet's initial weights into the Flax
model, then trains BOTH with identical batches, the frozen tuned
FocalDice constants, and AdamW — printing per-step losses side by side.
Validates model forward/backward, BatchNorm double-pass stat updates,
loss, and optimizer semantics end-to-end, independent of init seeds.

Measured 2026-08-16: per-step |loss_torch - loss_jax| stays ~1e-4 over
12 steps (f32 reassociation noise), confirming dynamics parity; see
PARITY.md for the statistical (seed-level) comparison.

Run: python scripts/check_training_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, torch
import torch.nn.functional as F
import models as ref_models
import jax.numpy as jnp
from gan_aug_pfa_tpu.models import SiameseUNet
from gan_aug_pfa_tpu.losses import focal_dice_loss
from check_forward_parity import port_double_conv, port_attention, conv_w
import optax

LOSS = dict(beta=0.6699803915247974, focal_gamma=1.7930869982898021,
            focal_alpha=0.6030489822904476, dice_smooth=1.956571276926647e-06)
LR, WD = 0.00010152447097322304, 1.1180726948943663e-05

torch.manual_seed(0)
tm = ref_models.SiameseUNet(3, 1)
params, stats = {}, {}
for name in ("dconv_down1","dconv_down2","dconv_down3","dconv_down4","bottleneck","dconv_up3","dconv_up2","dconv_up1","dconv_last"):
    p, s = port_double_conv(getattr(tm, name)); params[name]=p; stats[name]=s
for name in ("att3","att2","att1","att_last"):
    p, s = port_attention(getattr(tm, name)); params[name]=p; stats[name]=s
params["conv_head"] = {"kernel": conv_w(tm.conv_last.weight), "bias": tm.conv_last.bias.detach().numpy()}
params = jax.tree.map(jnp.asarray, params); stats = jax.tree.map(jnp.asarray, stats)

jm = SiameseUNet(3, 1)
tx = optax.adamw(LR, weight_decay=WD)
opt_state = tx.init(params)
topt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)

rng = np.random.RandomState(0)
S = 64
def batch():
    x1 = rng.rand(4,S,S,3).astype(np.float32)*2-1
    x2 = rng.rand(4,S,S,3).astype(np.float32)*2-1
    y  = (rng.rand(4,S,S) > 0.9).astype(np.float32)
    return x1, x2, y

def tloss(logits, y):
    bce = F.binary_cross_entropy_with_logits(logits, y, reduction='none')
    pt = torch.exp(-bce)
    at = y*LOSS['focal_alpha'] + (1-y)*(1-LOSS['focal_alpha'])
    focal = (at*(1-pt)**LOSS['focal_gamma']*bce).mean()
    p = torch.sigmoid(logits).reshape(-1); t = y.reshape(-1)
    dice = 1 - (2*(p*t).sum()+LOSS['dice_smooth'])/(p.sum()+t.sum()+LOSS['dice_smooth'])
    return LOSS['beta']*focal + (1-LOSS['beta'])*dice

@jax.jit
def jstep(params, stats, opt_state, x1, x2, y):
    def loss_fn(p):
        logits, mut = jm.apply({'params': p, 'batch_stats': stats}, x1, x2, train=True, mutable=['batch_stats'])
        l = focal_dice_loss(logits, y[..., None], beta=LOSS['beta'], focal_gamma=LOSS['focal_gamma'], focal_alpha=LOSS['focal_alpha'], dice_smooth=LOSS['dice_smooth'])
        return l, mut['batch_stats']
    (l, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, upd), new_stats, opt_state, l

batches = [batch() for _ in range(12)]
tm.train()
for i, (x1, x2, y) in enumerate(batches):
    t1 = torch.from_numpy(np.transpose(x1,(0,3,1,2)))
    t2 = torch.from_numpy(np.transpose(x2,(0,3,1,2)))
    ty = torch.from_numpy(y)[:, None]
    topt.zero_grad()
    tl = tloss(tm(t1, t2), ty)
    tl.backward(); topt.step()
    params, stats, opt_state, jl = jstep(params, stats, opt_state, jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y))
    print(f"step {i}: torch={float(tl):.6f} jax={float(jl):.6f} diff={abs(float(tl)-float(jl)):.2e}", flush=True)
