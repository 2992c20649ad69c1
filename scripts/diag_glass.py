"""Root-cause the sphere_glass TPU-vs-CPU PSNR outlier (49 dB vs 82-96 dB
on the six sibling gates, BENCH_r03.json).

Two phases (separate processes — the TPU grant is exclusive):

  python scripts/diag_glass.py cpu    # render variants + op probes on CPU
  python scripts/diag_glass.py tpu    # same on TPU, print PSNR + analysis

Variants bisect the dielectric path (pathtraceintegrator.cpp:197-206,
dielectric.h:68-111 semantics):
  gate    depth 8, spp 32  — the bench gate config
  d2      depth 2          — camera hit + direct light only
  d4      depth 4          — one refraction in/out
  nobeer  gate w/ medium transmission forced to 1 (Beer disabled)
  norefr  gate w/ the DIELECTRIC_TRANSMIT lobe removed (reflect-only)

Op probes isolate kernel numerics from path chaos: _fresnel_dielectric
and refract evaluated on a dense (cos_i, eta) grid straddling the TIR
boundary, compared against numpy f64 ground truth; TIR-side flips
(k >= 0 disagreement) are counted separately — a flipped ray takes a
categorically different path, which low-spp PSNR punishes hard.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

PHASE = sys.argv[1] if len(sys.argv) > 1 else 'cpu'
if PHASE == 'cpu':
    os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np  # noqa: E402

OUT = '/tmp/glass_ref'
RES = 64
SEED = 42


def variants():
    """name -> (scene builder thunk, depth, spp)."""
    from yulio_raytracer_tpu.io import builtin_scenes
    import dataclasses

    def plain():
        return builtin_scenes.sphere_glass()

    def nobeer():
        sb = builtin_scenes.sphere_glass()
        for i, m in enumerate(sb.materials):
            if m.is_media_interface:
                sb.materials[i] = dataclasses.replace(
                    m, medium_in_trans=(1.0, 1.0, 1.0),
                    medium_out_trans=(1.0, 1.0, 1.0))
        return sb

    def norefr():
        from yulio_raytracer_tpu.shading import lobes as lb
        sb = builtin_scenes.sphere_glass()
        for i, m in enumerate(sb.materials):
            if m.is_media_interface:
                keep = [lo for lo in m.lobes
                        if lo.type != lb.DIELECTRIC_TRANSMIT]
                sb.materials[i] = dataclasses.replace(m, lobes=keep)
        return sb

    return {
        'gate': (plain, 8, 32),
        'd2': (plain, 2, 32),
        'd4': (plain, 4, 32),
        'nobeer': (nobeer, 8, 32),
        'norefr': (norefr, 8, 32),
    }


def render(sb_thunk, depth, spp):
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum
    scene = sb_thunk().commit()
    cam = builtin_scenes.sphere_glass_camera(RES, RES)
    film, _ = renderer.render_frame(scene, cam,
                                    pt.PTParams(max_depth=depth),
                                    RES, RES, spp=spp, seed=SEED)
    return np.asarray(accum.resolve(film))


def probes():
    """(fresnel F, refract dir, tir mask) on a dense grid straddling TIR."""
    import jax
    import jax.numpy as jnp
    from yulio_raytracer_tpu.shading.lobes import _fresnel_dielectric
    from yulio_raytracer_tpu.core import math as vm

    eta = np.float32(1.0 / 1.4)          # inside -> outside (TIR side)
    # cos_i dense near the TIR boundary cos_c = sqrt(1 - 1/eta^2)
    cos_c = np.sqrt(max(0.0, 1.0 - 1.0 / float(eta) ** 2))
    cos_i = np.concatenate([
        np.linspace(0, 1, 4096),
        cos_c + np.linspace(-1e-3, 1e-3, 4096)]).astype(np.float32)
    cos_i = np.clip(cos_i, 0.0, 1.0)
    n = np.tile(np.array([[0., 0., 1.]], np.float32), (len(cos_i), 1))
    s = np.sqrt(np.maximum(1.0 - cos_i ** 2, 0.0))
    v = np.stack([s, np.zeros_like(s), cos_i], -1).astype(np.float32)

    f, cost = jax.jit(_fresnel_dielectric)(jnp.asarray(cos_i),
                                           jnp.asarray(eta))
    d, ok, _ = jax.jit(vm.refract)(jnp.asarray(v), jnp.asarray(n),
                                   jnp.full((len(cos_i),), eta),
                                   jnp.asarray(cos_i))
    return (cos_i.astype(np.float64), np.asarray(f, np.float64),
            np.asarray(d, np.float64), np.asarray(ok))


def psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(max(float(b.max()), 1e-9) ** 2 / max(mse, 1e-20))


def main():
    import jax
    if PHASE == 'cpu':
        # the axon TPU plugin beats the env var; force CPU explicitly
        jax.config.update('jax_platforms', 'cpu')
    os.makedirs(OUT, exist_ok=True)
    backend = jax.default_backend()
    print("backend:", backend, flush=True)

    cos_i, f, d, ok = probes()
    if PHASE == 'cpu':
        np.savez(os.path.join(OUT, 'probes_cpu.npz'),
                 cos_i=cos_i, f=f, d=d, ok=ok)
        for name, (thunk, depth, spp) in variants().items():
            img = render(thunk, depth, spp)
            np.savez(os.path.join(OUT, '%s_cpu.npz' % name), img=img)
            print("cpu %-7s mean=%.5f" % (name, img.mean()), flush=True)
        return

    # ---- TPU phase ----
    ref = np.load(os.path.join(OUT, 'probes_cpu.npz'))
    # f64 ground truth for the probe ops
    eta = 1.0 / 1.4
    k64 = 1.0 - eta * eta * (1.0 - cos_i ** 2)
    tir64 = k64 < 0
    for label, tpu_v, cpu_v in (('fresnel F', f, ref['f']),
                                ('refract d', d, ref['d'])):
        print("%-10s  |tpu-cpu| max %.3e  mean %.3e" % (
            label, np.abs(tpu_v - cpu_v).max(),
            np.abs(tpu_v - cpu_v).mean()), flush=True)
    flips_tpu = int((ok != ~tir64).sum())
    flips_cpu = int((ref['ok'] != ~tir64).sum())
    agree = int((ok != ref['ok']).sum())
    print("TIR flips vs f64: tpu %d  cpu %d  tpu-vs-cpu disagreements %d"
          % (flips_tpu, flips_cpu, agree), flush=True)

    for name, (thunk, depth, spp) in variants().items():
        img = render(thunk, depth, spp)
        cpu = np.load(os.path.join(OUT, '%s_cpu.npz' % name))['img']
        np.savez(os.path.join(OUT, '%s_tpu.npz' % name), img=img)
        p = psnr(img, cpu)
        err = ((img - cpu) ** 2).mean(axis=-1).ravel()
        top = np.sort(err)[::-1]
        k = max(1, len(err) // 100)
        conc = float(top[:k].sum() / max(err.sum(), 1e-30))
        # trimmed PSNR: drop the top-1% divergent pixels.  If the rest
        # agrees at sibling-gate levels, the outlier is chaotic path
        # flips at discrete decision boundaries (silhouette tangencies,
        # reflect/refract lobe picks), not kernel numerics.
        mse_trim = float(np.sort(err)[:len(err) - k].mean())
        p_trim = 10.0 * np.log10(max(float(cpu.max()), 1e-9) ** 2
                                 / max(mse_trim, 1e-20))
        print("tpu %-7s PSNR %6.2f dB   top-1%%-share %5.1f%%   "
              "trimmed-1%% PSNR %6.2f dB"
              % (name, p, 100 * conc, p_trim), flush=True)


if __name__ == '__main__':
    main()
