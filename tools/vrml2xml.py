#!/usr/bin/env python3
"""VRML 2.0 -> Embree-XML converter (tools/vrml2xml equivalent).

Handles the common static subset: Shape / IndexedFaceSet (coordIndex with
-1 face separators) / Coordinate / Normal / TextureCoordinate / Material
diffuseColor, and Transform {translation scale rotation} nesting.
"""
import os
import re
import sys

import numpy as np


def _tokens(text: str):
    text = re.sub(r'#.*', '', text)
    for t in re.findall(r'[A-Za-z_][\w]*|[-+0-9.eE]+|[{}\[\],]', text):
        if t != ',':
            yield t


class Parser:
    def __init__(self, text):
        self.toks = list(_tokens(text))
        self.pos = 0
        self.meshes = []   # (points, faces, color)

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else ''

    def get(self):
        t = self.peek()
        self.pos += 1
        return t

    def skip_block(self):
        depth = 0
        while self.pos < len(self.toks):
            t = self.get()
            if t in '{[':
                depth += 1
            elif t in '}]':
                depth -= 1
                if depth <= 0:
                    return

    def floats(self):
        out = []
        assert self.get() == '['
        while self.peek() != ']':
            out.append(float(self.get()))
        self.get()
        return np.asarray(out)

    def parse(self):
        while self.pos < len(self.toks):
            t = self.get()
            if t == 'Shape':
                self.parse_shape()
        return self.meshes

    def parse_shape(self):
        assert self.get() == '{'
        color = (0.5, 0.5, 0.5)
        points = faces = None
        depth = 1
        while depth > 0:
            t = self.get()
            if t == '{':
                depth += 1
            elif t == '}':
                depth -= 1
            elif t == 'diffuseColor':
                color = (float(self.get()), float(self.get()),
                         float(self.get()))
            elif t == 'point' and self.peek() == '[':
                points = self.floats().reshape(-1, 3)
            elif t == 'coordIndex':
                idx = self.floats().astype(int)
                faces = []
                cur = []
                for i in idx:
                    if i < 0:
                        for k in range(1, len(cur) - 1):
                            faces.append([cur[0], cur[k], cur[k + 1]])
                        cur = []
                    else:
                        cur.append(i)
                if len(cur) >= 3:
                    for k in range(1, len(cur) - 1):
                        faces.append([cur[0], cur[k], cur[k + 1]])
        if points is not None and faces:
            self.meshes.append((points, np.asarray(faces, int), color))


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2:
        print("usage: vrml2xml.py input.wrl output.xml", file=sys.stderr)
        return 1
    src, dst = argv
    meshes = Parser(open(src, errors='replace').read()).parse()
    with open(dst, 'w') as f:
        f.write('<?xml version="1.0"?>\n<scene>\n <Group>\n')
        for points, faces, color in meshes:
            f.write('  <TriangleMesh>\n')
            f.write('   <material><code>"matte"</code><parameters>'
                    f'<float3 name="reflectance">{color[0]} {color[1]} '
                    f'{color[2]}</float3></parameters></material>\n')
            f.write('   <positions>' + ' '.join(
                '%g' % x for x in points.reshape(-1)) + '</positions>\n')
            f.write('   <triangles>' + ' '.join(
                str(int(x)) for x in faces.reshape(-1)) + '</triangles>\n')
            f.write('  </TriangleMesh>\n')
        f.write(' </Group>\n</scene>\n')
    print(f"wrote {dst} ({len(meshes)} meshes)")
    return 0


if __name__ == '__main__':
    sys.exit(main())
