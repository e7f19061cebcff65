"""Same-hardware framework comparison: torch-eager QAT vs ofq_tpu (XLA).

The reference publishes no throughput numbers and its GPUs aren't available
here, so this benchmark isolates the FRAMEWORK factor on identical
hardware (this machine's CPU): one W2A2 QAT train step of the same
DeiT-tiny-like model, implemented (a) reference-style — eager torch modules
with detach-arithmetic STEs, per-site quantizer objects, module-tree
forward — and (b) with ofq_tpu's jitted step.

The torch side below is written from the quantizer math (per-token LSQ,
per-row StatsQ, mid-rise levels) in eager style; it is NOT the reference
code, but it pays the same structural costs the reference pays: one Python
dispatch + several tensor temporaries per quantizer call.

Usage: python benchmarks/framework_compare.py [batch] [iters]
Prints one JSON line with both steps/sec and the ratio.
"""

import json
import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEPTH = 4
DIM = 192
HEADS = 3
IMG = 96
PATCH = 16
CLASSES = 100
BITS = 2


# ----------------------------------------------------------- torch side
def torch_steps_per_sec(batch: int, iters: int) -> float:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)

    def ste_round(x):
        return (x.round() - x).detach() + x

    def lsq(x, s, bit, all_positive, token_axis=-2):
        lo, hi = (0, 2**bit - 1) if all_positive else (
            -(2 ** (bit - 1)), 2 ** (bit - 1) - 1)
        g = 1.0 / ((hi * x.numel() / x.shape[token_axis]) ** 0.5)
        shape = [1] * x.dim()
        shape[token_axis] = -1
        s = s.reshape(shape)
        s = s.clamp_min(1e-5)
        s = (s - s * g).detach() + s * g
        y = (x / s).clamp(lo, hi)
        return ste_round(y) * s

    def statsq(w, bit):
        s = (2 * w.abs().mean(dim=1, keepdim=True)).detach()
        c = (w / s).clamp(-1.0, 1.0 - 1e-6)
        n = float(2 ** (bit - 1))
        q = s * ((torch.round(c * n - 0.5) + 0.5) / n)
        return (q - w).detach() + w

    class QLin(nn.Module):
        def __init__(self, din, dout, tokens, all_positive=False):
            super().__init__()
            self.w = nn.Parameter(torch.randn(dout, din) * 0.02)
            self.b = nn.Parameter(torch.zeros(dout))
            self.pre = nn.Parameter(torch.zeros(din))
            self.post = nn.Parameter(torch.zeros(din))
            self.s = nn.Parameter(torch.full((tokens,), 0.1))
            self.ap = all_positive

        def forward(self, x):
            x = lsq(x + self.pre, self.s, BITS, self.ap) + self.post
            return F.linear(x, statsq(self.w, BITS), self.b)

    n_tok = (IMG // PATCH) ** 2 + 2

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = nn.LayerNorm(DIM)
            self.n2 = nn.LayerNorm(DIM)
            self.qkv = QLin(DIM, 3 * DIM, n_tok)
            self.proj = QLin(DIM, DIM, n_tok)
            self.fc1 = QLin(DIM, 4 * DIM, n_tok)
            self.fc2 = QLin(4 * DIM, DIM, n_tok, all_positive=True)
            self.sq = nn.Parameter(torch.full((n_tok,), 0.1))
            self.sk = nn.Parameter(torch.full((n_tok,), 0.1))
            self.sv = nn.Parameter(torch.full((DIM,), 0.1))
            self.ss = nn.Parameter(torch.full((n_tok,), 0.1))

        def forward(self, x):
            B, N, C = x.shape
            d = C // HEADS
            h = self.n1(x)
            qkv = self.qkv(h).reshape(B, N, 3, HEADS, d).permute(2, 0, 3, 1, 4)
            q = lsq(qkv[0], self.sq, BITS, False)
            k = lsq(qkv[1], self.sk, BITS, False)
            v = lsq(qkv[2].permute(0, 2, 1, 3).reshape(B, N, C),
                    self.sv, BITS, False, token_axis=-1)
            v = v.reshape(B, N, HEADS, d).permute(0, 2, 1, 3)
            a = (q @ k.transpose(-2, -1)) * d ** -0.5
            a = lsq(a.softmax(-1), self.ss, BITS, True)
            o = (a @ v).transpose(1, 2).reshape(B, N, C)
            x = x + self.proj(o)
            h = self.n2(x)
            return x + self.fc2(F.gelu(self.fc1(h)))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Conv2d(3, DIM, PATCH, PATCH)
            self.cls = nn.Parameter(torch.zeros(1, 2, DIM))
            self.pos = nn.Parameter(torch.zeros(1, n_tok, DIM))
            self.blocks = nn.ModuleList([Blk() for _ in range(DEPTH)])
            self.norm = nn.LayerNorm(DIM)
            self.head = nn.Linear(DIM, CLASSES)

        def forward(self, x):
            t = self.embed(x).flatten(2).transpose(1, 2)
            t = torch.cat([self.cls.expand(x.shape[0], -1, -1), t], 1) + self.pos
            for b in self.blocks:
                t = b(t)
            return self.head(self.norm(t)[:, 0])

    net = Net()
    opt = torch.optim.AdamW(net.parameters(), lr=1e-3)
    x = torch.randn(batch, 3, IMG, IMG)
    y = torch.randint(0, CLASSES, (batch,))

    def step():
        opt.zero_grad()
        loss = F.cross_entropy(net(x), y)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return iters / (time.perf_counter() - t0)


# ------------------------------------------------------------- jax side
def jax_steps_per_sec(batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from ofq_tpu.models import DeiTConfig, VisionTransformer
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args
    from ofq_tpu.train import TrainState, make_optimizer, make_train_step

    cfg = DeiTConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                     depth=DEPTH, num_heads=HEADS, num_classes=CLASSES)
    pol = policy_from_args(wq_bitw=BITS, aq_bitw=BITS,
                           qmodules=default_deit_qmodules(DEPTH))
    model = VisionTransformer(cfg=cfg, policy=pol)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, IMG, IMG, 3)), jnp.float32)
    b = {"image": x, "label": jnp.asarray(rng.integers(0, CLASSES, batch))}
    params = jax.jit(lambda k, xx: model.init(
        {"params": k}, xx, train=False))(jax.random.key(0), x)
    tx = make_optimizer(lambda _: 1e-3)
    state = jax.jit(lambda p: TrainState.create(p, tx))(params)
    step = jax.jit(make_train_step(model, tx, loss_kind="ce"),
                   donate_argnums=(0,))
    key = jax.random.key(1)
    state, m = step(state, b, key)
    float(m["loss"])  # warmup + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, b, key)
        float(m["loss"])  # sync EVERY step: same semantics as eager torch
    return iters / (time.perf_counter() - t0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tj = jax_steps_per_sec(batch, iters)
    tt = torch_steps_per_sec(batch, iters)
    print(json.dumps({
        "workload": f"W{BITS}A{BITS} QAT step, depth={DEPTH}, dim={DIM}, "
                    f"img={IMG}, batch={batch}, CPU",
        "torch_eager_steps_per_sec": round(tt, 3),
        "ofq_tpu_xla_steps_per_sec": round(tj, 3),
        "speedup": round(tj / tt, 2),
    }))


if __name__ == "__main__":
    main()
