"""Ground control points (reference rasterio/control.py:6-60 surface:
row/col image coordinates mapped to x/y(/z) world coordinates)."""

from __future__ import annotations

import uuid


class GroundControlPoint:
    """A mapping of (row, col) image coordinates to (x, y, z)."""

    def __init__(self, row=None, col=None, x=None, y=None, z=None, id=None, info=None):
        if any(v is None for v in (row, col, x, y)):
            raise ValueError("row, col, x, and y are required parameters.")
        self.id = id if id is not None else str(uuid.uuid4())
        self.info = info
        self.row = row
        self.col = col
        self.x = x
        self.y = y
        self.z = z

    def __repr__(self):
        args = ", ".join(
            f"{att}={getattr(self, att)!r}"
            for att in ("row", "col", "x", "y", "z", "id", "info")
            if getattr(self, att) is not None
        )
        return f"GroundControlPoint({args})"

    def asdict(self):
        return {
            "id": self.id,
            "info": self.info,
            "row": self.row,
            "col": self.col,
            "x": self.x,
            "y": self.y,
            "z": self.z,
        }
