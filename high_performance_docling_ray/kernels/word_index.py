"""Spatial word index: struct-of-arrays uniform grid over word cells.

Same semantics as the reference's PageWordIndex
(`/root/reference/page_word_index.py:5-199`): words are indexed into a
uniform gx x gy grid; bbox queries return words whose
intersection-over-self >= ios (default 0.8); whitespace-only words are
dropped and word text is stripped at query time.

The index is rebuilt per batch inside the worker from the page's word
list column — it never crosses a block boundary (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np


class WordIndex:
    __slots__ = ("l", "t", "r", "b", "ids", "texts", "area", "W", "H",
                 "gx", "gy", "grid", "n")

    def __init__(
        self,
        l: np.ndarray,
        t: np.ndarray,
        r: np.ndarray,
        b: np.ndarray,
        ids: np.ndarray,
        texts: list[str],
        page_w: float,
        page_h: float,
        grid_nx: int | None = None,
        grid_ny: int | None = None,
    ) -> None:
        n = len(texts)
        self.n = n
        self.l = np.asarray(l, np.float32)
        self.t = np.asarray(t, np.float32)
        self.r = np.asarray(r, np.float32)
        self.b = np.asarray(b, np.float32)
        self.ids = np.asarray(ids, np.int64)
        self.texts = texts
        self.area = (self.r - self.l) * (self.b - self.t)
        self.W = float(page_w)
        self.H = float(page_h)
        if n == 0:
            self.gx = self.gy = 0
            self.grid = []
            return
        # Grid sizing heuristic ~ sqrt(N)/2 per axis in [8, 64]
        # (page_word_index.py:57-62).
        if grid_nx is None or grid_ny is None:
            g = max(8, min(64, int(np.sqrt(max(n, 1)) // 2 or 8)))
            grid_nx = grid_nx or g
            grid_ny = grid_ny or g
        self.gx, self.gy = int(grid_nx), int(grid_ny)
        self.grid: list[list[int]] = [[] for _ in range(self.gx * self.gy)]
        cw = self.W / self.gx
        ch = self.H / self.gy
        ix0 = np.clip((self.l / cw).astype(int), 0, self.gx - 1)
        ix1 = np.clip(((self.r - 1e-6) / cw).astype(int), 0, self.gx - 1)
        iy0 = np.clip((self.t / ch).astype(int), 0, self.gy - 1)
        iy1 = np.clip(((self.b - 1e-6) / ch).astype(int), 0, self.gy - 1)
        for i in range(n):
            for gx in range(ix0[i], ix1[i] + 1):
                row = gx * self.gy
                for gy in range(iy0[i], iy1[i] + 1):
                    self.grid[row + gy].append(i)

    @classmethod
    def from_cells(cls, cells: list[dict], page_w: float, page_h: float) -> "WordIndex":
        n = len(cells)
        return cls(
            np.fromiter((c["l"] for c in cells), np.float32, n),
            np.fromiter((c["t"] for c in cells), np.float32, n),
            np.fromiter((c["r"] for c in cells), np.float32, n),
            np.fromiter((c["b"] for c in cells), np.float32, n),
            np.fromiter((c["index"] for c in cells), np.int64, n),
            [c["text"] for c in cells],
            page_w,
            page_h,
        )

    def _candidates(self, ql: float, qt: float, qr: float, qb: float) -> np.ndarray:
        if self.gx == 0 or self.gy == 0:
            return np.empty((0,), np.int32)
        cw = self.W / self.gx
        ch = self.H / self.gy
        gx0 = int(np.clip(ql / cw, 0, self.gx - 1))
        gx1 = int(np.clip((qr - 1e-6) / cw, 0, self.gx - 1))
        gy0 = int(np.clip(qt / ch, 0, self.gy - 1))
        gy1 = int(np.clip((qb - 1e-6) / ch, 0, self.gy - 1))
        cand: list[int] = []
        for gx in range(gx0, gx1 + 1):
            row = gx * self.gy
            for gy in range(gy0, gy1 + 1):
                cand.extend(self.grid[row + gy])
        if not cand:
            return np.empty((0,), np.int32)
        return np.unique(np.fromiter(cand, np.int32))

    def query_idx(
        self, ql: float, qt: float, qr: float, qb: float, ios: float = 0.8
    ) -> np.ndarray:
        """Word row-indices with IoS >= ios vs the query bbox
        (page_word_index.py:130-158)."""
        cand = self._candidates(ql, qt, qr, qb)
        if cand.size == 0:
            return cand
        iw = np.maximum(
            0.0, np.minimum(self.r[cand], qr) - np.maximum(self.l[cand], ql)
        )
        ih = np.maximum(
            0.0, np.minimum(self.b[cand], qb) - np.maximum(self.t[cand], qt)
        )
        keep = (iw * ih) / (self.area[cand] + 1e-6) >= ios
        return cand[keep]

    def pack_tokens(self, indices: np.ndarray, scale: float = 1.0) -> list[dict]:
        """Row indices -> token dicts, stripping text and dropping
        whitespace-only words (page_word_index.py:170-188)."""
        out: list[dict] = []
        s = float(scale)
        for i in indices.tolist():
            txt = (self.texts[i] or "").strip()
            if not txt:
                continue
            out.append(
                {
                    "id": int(self.ids[i]),
                    "text": txt,
                    "bbox": {
                        "l": float(self.l[i] * s),
                        "t": float(self.t[i] * s),
                        "r": float(self.r[i] * s),
                        "b": float(self.b[i] * s),
                    },
                }
            )
        return out

    def query_tokens(
        self, ql: float, qt: float, qr: float, qb: float,
        ios: float = 0.8, scale: float = 1.0,
    ) -> list[dict]:
        return self.pack_tokens(self.query_idx(ql, qt, qr, qb, ios), scale)
