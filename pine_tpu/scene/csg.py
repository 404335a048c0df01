"""CSG shapes (parity: geometry.cpp:764-830; PRL operators +,*,- on shapes).

The reference resolves CSG by walking intersection intervals with repeated
``intersect`` calls.  TPU-native plan: resolve union/intersection/difference
with a bounded interval walk over both children (static step count).  The
interval walk is implemented in :mod:`pine_tpu.scene.csg_intersect`.
"""
from __future__ import annotations

from pine_tpu.scene.shapes import Shape


class CSGShape(Shape):
    def __init__(self, a: Shape, b: Shape):
        self.a = a
        self.b = b

    def get_aabb(self):
        import numpy as np

        la, ua = self.a.get_aabb()
        lb, ub = self.b.get_aabb()
        return np.minimum(la, lb), np.maximum(ua, ub)


class CSGUnion(CSGShape):
    op = "union"


class CSGIntersection(CSGShape):
    op = "intersection"

    def get_aabb(self):
        import numpy as np

        la, ua = self.a.get_aabb()
        lb, ub = self.b.get_aabb()
        return np.maximum(la, lb), np.minimum(ua, ub)


class CSGDifference(CSGShape):
    op = "difference"

    def get_aabb(self):
        return self.a.get_aabb()
