"""Distributed rendering over TCP — the `device_network` equivalent.

For TPU pods the idiomatic scaling path is `parallel.sharding` (ICI
collectives).  This module reproduces the reference's *process-level*
distribution for DCN-connected, independently-launched hosts
(`devices/device_network/`):

* a render **server** wraps the local renderer and renders only its
  interleaved row bands — the exact reference decomposition
  `((y >> 2) - serverID) % serverCount == 0` (swapchain.h:57-60,
  network_server.cpp:669);
* a **client** connects to N servers, broadcasts the scene + render
  command to all (network_device.h:103-110), and merges the returned
  bands (network_device.cpp:268-310).

Protocol: length-prefixed pickled messages (the reference used raw
opcode-tagged structs with RGBE8/JPEG encodings; on modern links we ship
f32 rows — add the u8 encodings when bandwidth-bound).  Determinism: band
assignment only selects *pixels*; the stateless RNG keys by absolute
pixel id, so the merged image is bit-identical to a single-host render.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Optional

import numpy as np

_HDR = struct.Struct(">Q")
MAGICK = 0x32657845   # network_common.h:26


def _send(sock: socket.socket, obj):
    data = pickle.dumps(obj, protocol=4)
    sock.sendall(_HDR.pack(len(data)) + data)


def _recv(sock: socket.socket):
    hdr = b''
    while len(hdr) < _HDR.size:
        chunk = sock.recv(_HDR.size - len(hdr))
        if not chunk:
            raise ConnectionError("peer disconnected")   # network.h:30
        hdr += chunk
    (n,) = _HDR.unpack(hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer disconnected")
        buf += chunk
    return pickle.loads(bytes(buf))


def rgbe8_encode(rgb: np.ndarray) -> np.ndarray:
    """Ward RGBE shared-exponent encoding (network_common.h:83-103's
    compression tier): (..., 3) f32 -> (..., 4) u8."""
    v = rgb.max(axis=-1)
    mant, expo = np.frexp(np.maximum(v, 1e-32))
    scale = np.where(v >= 1e-32, mant * 256.0 / np.maximum(v, 1e-32), 0.0)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    out[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    out[..., 3] = np.where(v >= 1e-32, expo + 128, 0).astype(np.uint8)
    return out


def rgbe8_decode(rgbe: np.ndarray) -> np.ndarray:
    e = rgbe[..., 3].astype(np.int32)
    f = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * f[..., None]


def jpeg_encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    """JPEG row-band tier (network_server.cpp:680-739, libjpeg-turbo
    there; Pillow's C libjpeg here).  Linear radiance is sent through a
    gamma-2.2 transfer so JPEG's perceptual quantization operates in
    display space; values above 1.0 clip (lossy by design — the tier
    exists for thin DCN links)."""
    import io
    from PIL import Image
    u8 = np.clip(np.power(np.maximum(rgb, 0.0), 1.0 / 2.2) * 255.0 + 0.5,
                 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format='JPEG', quality=int(quality))
    return buf.getvalue()


def jpeg_decode(data: bytes) -> np.ndarray:
    import io
    from PIL import Image
    with Image.open(io.BytesIO(data)) as im:
        u8 = np.asarray(im.convert('RGB'), np.float32)
    return np.power(u8 / 255.0, 2.2)


def active_rows(height: int, server_id: int, server_count: int) -> np.ndarray:
    """The reference's 4-row band interleave (swapchain.h:57-60)."""
    y = np.arange(height)
    return np.nonzero(((y >> 2) - server_id) % server_count == 0)[0]


class RenderServer:
    """`network_server_main.cpp` analog: serve render requests forever."""

    def __init__(self, port: int, host: str = '127.0.0.1',
                 single_connection: bool = False, verbose: bool = False):
        self.port = port
        self.host = host
        self.single = single_connection
        self.verbose = verbose
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(4)
        self._stop = threading.Event()

    def serve_forever(self):
        while not self._stop.is_set():
            try:
                self._sock.settimeout(0.5)
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            try:
                self._serve_one(conn)
            finally:
                conn.close()
            if self.single:
                break

    def stop(self):
        self._stop.set()

    def _serve_one(self, conn):
        hello = _recv(conn)
        if hello.get('magick') != MAGICK:
            raise ConnectionError("bad magick")
        server_id = hello['serverID']          # network_device.cpp:100-106
        server_count = hello['serverCount']
        state = {}
        while True:
            try:
                msg = _recv(conn)
            except ConnectionError:
                return
            op = msg['op']
            if op == 'set_scene':
                # scene arrives as the staged host-side description
                state['builder_bytes'] = msg['builder']
            elif op == 'render':
                _send(conn, self._render(state, msg, server_id,
                                         server_count))
            elif op == 'close':
                return

    def _render(self, state, msg, server_id, server_count):
        from ..scene import SceneBuilder  # noqa: F401 (unpickle target)
        from ..integrator import pathtracer as pt
        from .. import renderer as grenderer
        from ..film import accum

        sb = pickle.loads(state['builder_bytes'])
        scene = sb.commit()
        camera = pickle.loads(msg['camera'])
        params = pt.PTParams(**msg['params'])
        w, h, spp = msg['width'], msg['height'], msg['spp']

        rows = active_rows(h, server_id, server_count)
        # render only our rows: pass their pixel ids through the chunk API
        import jax.numpy as jnp
        pix = (rows[:, None] * w + np.arange(w)[None, :]).reshape(-1)
        film = accum.create(len(rows), w)
        rgb = np.zeros((len(pix), 3), np.float32)
        chunk = 1 << 17
        for s in range(spp):
            for lo in range(0, len(pix), chunk):
                hi = min(lo + chunk, len(pix))
                ids = np.resize(pix[lo:hi].astype(np.uint32), chunk)
                out, _ = grenderer._render_chunk(
                    scene, camera, params, w, h, spp,
                    jnp.asarray(ids),
                    jnp.full((chunk,), np.uint32(s)),
                    np.uint32(msg.get('seed', 0)), None,
                    spp_per_pass=1)
                rgb[lo:hi] += np.asarray(out[:hi - lo])
        out = rgb.reshape(len(rows), w, 3)
        if msg.get('encoding') == 'rgbe8':
            # the bandwidth tier of network_common.h:83-103
            return {'rows': rows, 'rgbe': rgbe8_encode(out),
                    'weight': float(spp)}
        if msg.get('encoding') == 'jpeg':
            # the thin-link tier (network_server.cpp:680-739); the wire
            # carries per-spp-averaged radiance as a JPEG
            return {'rows': rows,
                    'jpeg': jpeg_encode(out / max(spp, 1),
                                        msg.get('jpeg_quality', 90)),
                    'weight': float(spp)}
        return {'rows': rows, 'rgb': out, 'weight': float(spp)}


class NetworkClient:
    """`NetworkDevice` analog: broadcast scene + render, merge bands."""

    def __init__(self, addresses: list, connect_timeout: float = 30.0):
        self.socks = []
        for i, (host, port) in enumerate(addresses):
            s = socket.create_connection((host, port),
                                         timeout=connect_timeout)
            # renders (first-compile especially) can take minutes — only
            # the connect is bounded; replies block indefinitely
            s.settimeout(None)
            _send(s, {'magick': MAGICK, 'serverID': i,
                      'serverCount': len(addresses)})
            self.socks.append(s)

    def set_scene(self, builder):
        payload = pickle.dumps(builder, protocol=4)
        for s in self.socks:
            _send(s, {'op': 'set_scene', 'builder': payload})

    def render(self, camera, params, width, height, spp, seed=0,
               encoding: str = 'native', jpeg_quality: int = 90):
        """encoding: 'native' (f32 rows), 'rgbe8' (4 B/px shared-exponent,
        network_device.cpp:256-310) or 'jpeg' (lossy row bands with
        quality 1-100, the `-encode jpeg` tier of network_server.cpp)."""
        msg = {'op': 'render', 'camera': pickle.dumps(camera, protocol=4),
               'params': {**params.__dict__}, 'width': width,
               'height': height, 'spp': spp, 'seed': seed,
               'encoding': encoding, 'jpeg_quality': jpeg_quality}
        for s in self.socks:
            _send(s, msg)
        img = np.zeros((height, width, 3), np.float32)
        weight = np.zeros((height, width), np.float32)
        results = [None] * len(self.socks)
        errors = [None] * len(self.socks)

        def fetch(i):
            try:
                results[i] = _recv(self.socks[i])
            except Exception as e:           # surfaced below, not dropped
                errors[i] = e

        threads = [threading.Thread(target=fetch, args=(i,))
                   for i in range(len(self.socks))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, e in enumerate(errors):
            if e is not None:
                raise ConnectionError(f"server {i} failed: {e!r}") from e
        for r in results:
            if 'rgbe' in r:
                band = rgbe8_decode(r['rgbe'])
            elif 'jpeg' in r:
                band = jpeg_decode(r['jpeg']) * r['weight']
            else:
                band = r['rgb']
            img[r['rows']] = band
            weight[r['rows']] = r['weight']
        return img, weight

    def close(self):
        for s in self.socks:
            try:
                _send(s, {'op': 'close'})
                s.close()
            except OSError:
                pass
