"""Numpy quaternion helpers for BUILD-TIME code (URDF parsing, mechanism
assembly, schedule construction).

These duplicate the semantics of the jnp versions in lie.py (reference
src/orientation/quaternion.jl:16-223, rotate.jl:1-31) but run on the host:
build-time code must never dispatch eager jnp ops — on a TPU relay every
tiny op is a network round-trip (measured: 44 s of device transfers inside
one URDF parse).  Physics/trace-time code keeps using lie.py.
"""

from __future__ import annotations

import numpy as np


def qmul(a, b):
    """Hamilton product a*b for [w,x,y,z] quaternions."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        dtype=np.float64,
    )


def qconj(q):
    return np.asarray(q, dtype=np.float64) * np.array([1.0, -1.0, -1.0, -1.0])


def rotation_matrix(q):
    """3x3 rotation matrix of unit quaternion q."""
    w, x, y, z = np.asarray(q, dtype=np.float64)
    return np.array(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        ]
    )


def rotate(v, q):
    """Rotate vector v by quaternion q."""
    return rotation_matrix(q) @ np.asarray(v, dtype=np.float64)


def rpy_to_quat(rpy):
    """URDF roll-pitch-yaw (fixed-axis XYZ) to quaternion."""
    r, p, y = np.asarray(rpy, dtype=np.float64)

    def rot(angle, axis):
        q = np.zeros(4)
        q[0] = np.cos(angle / 2)
        q[axis + 1] = np.sin(angle / 2)
        return q

    return qmul(qmul(rot(y, 2), rot(p, 1)), rot(r, 0))
