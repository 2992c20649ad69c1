"""C-ABI shim: the YulioRT DLL surface (StartRT/WaitRT/StopRT/
GetLastErrorRT/GetCurrentStatusRT, YulioRT.h:53-57) exported from
native/libyuliort.so and driven by a real C host application
(examples/rt_test_host.c — the rt_test_dll/rt_test_dll.cpp analog).

Runs in a subprocess (the shim embeds its own CPython) with the JAX CPU
backend pinned via YRT_FORCE_CPU.
"""
import ctypes
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, 'native')
SHIM = os.path.join(NATIVE, 'libyuliort.so')
HOST = os.path.join(NATIVE, 'rt_test_host')
DAE = os.path.join(ROOT, 'assets', 'scenes', 'test_room.dae')


def _build():
    if shutil.which('make') is None:
        pytest.skip("no make in PATH")
    r = subprocess.run(['make', '-C', NATIVE, 'libyuliort.so',
                        'rt_test_host'], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr[-500:]}")


def test_shim_exports_c_surface():
    _build()
    lib = ctypes.CDLL(SHIM)
    for sym in ('StartRT', 'WaitRT', 'StopRT', 'GetLastErrorRT',
                'GetCurrentStatusRT'):
        assert hasattr(lib, sym)


def test_c_host_renders_end_to_end(tmp_path):
    _build()
    env = dict(os.environ)
    env['YRT_FORCE_CPU'] = '1'
    env['PYTHONPATH'] = ROOT + os.pathsep + env.get('PYTHONPATH', '')
    # outputs land next to the collada file (renderer.cpp behavior) —
    # stage the scene in the temp dir
    dae = str(tmp_path / 'test_room.dae')
    shutil.copy(DAE, dae)
    r = subprocess.run([HOST, dae, SHIM, '32', '1'], cwd=tmp_path,
                       env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert 'done: state=4' in r.stdout          # StateRT.Done
    assert 'lastError=0' in r.stdout            # ErrorCodeRT.NoError
    outs = list(tmp_path.glob('*.jpg'))
    assert outs, "host produced no stereo output"
