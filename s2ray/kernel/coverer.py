"""RegionCoverer: approximate a region by at most max_cells S2 cells.

From-scratch re-implementation of the reference S2RegionCoverer
(S2RegionCoverer.php:189-471): best-first refinement over a priority queue,
exterior and interior coverings, minLevel/maxLevel/levelMod knobs, result
normalized/denormalized exactly like the reference.

Determinism: the reference relies on SplPriorityQueue insertion order for
equal priorities (S2RegionCoverer.php:328); we replicate with heapq + a
monotonic counter (FIFO tie-break), so coverings are reproducible across
processes and cluster sizes (a join-output determinism requirement,
SURVEY.md par.7).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from . import cellid as ci
from . import cellunion, sphere
from .region import Cell

DEFAULT_MAX_CELLS = 8  # reference S2RegionCoverer.php:9


@dataclass
class _Candidate:
    cell: Cell
    is_terminal: bool
    children: list = field(default_factory=list)


class RegionCoverer:
    # Interior coverings can chase the region boundary all the way to level 30
    # (the canonical best-first algorithm has no depth bound and the rim grows
    # exponentially with level); bound the work deterministically.  Result
    # cells remain fully contained — the covering is just possibly smaller.
    INTERIOR_CANDIDATE_BUDGET = 4000

    def __init__(self, min_level: int = 0, max_level: int = ci.MAX_LEVEL,
                 level_mod: int = 1, max_cells: int = DEFAULT_MAX_CELLS):
        self.min_level = max(0, min(ci.MAX_LEVEL, min_level))
        self.max_level = max(0, min(ci.MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self.max_cells = max_cells
        self._region = None
        self._result: list | None = None
        self._pq: list | None = None
        self._counter = 0
        self._interior = False

    # -- public API --------------------------------------------------------

    def get_covering(self, region) -> np.ndarray:
        """Exterior covering as a normalized+denormalized uint64 id array
        (reference S2RegionCoverer.php:189-205)."""
        self._interior = False
        ids = self._get_covering_internal(region)
        return cellunion.denormalize(cellunion.normalize(ids),
                                     self.min_level, self.level_mod)

    def get_interior_covering(self, region) -> np.ndarray:
        """Interior covering (cells fully contained in the region);
        reference spec S2RegionCoverer.php:214-233."""
        self._interior = True
        ids = self._get_covering_internal(region)
        return cellunion.denormalize(cellunion.normalize(ids),
                                     self.min_level, self.level_mod)

    # -- internals ---------------------------------------------------------

    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _new_candidate(self, cell: Cell):
        """S2RegionCoverer::newCandidate (S2RegionCoverer.php:249-277)."""
        self._candidates_created += 1
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if self._interior:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if (cell.level + self.level_mod > self.max_level
                        or self._region.contains_cell(cell)):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _add_candidate(self, candidate):
        """S2RegionCoverer::addCandidate (S2RegionCoverer.php:289-338)."""
        if candidate is None:
            return
        if candidate.is_terminal:
            self._result.append(candidate.cell.id)
            return
        num_levels = 1 if candidate.cell.level < self.min_level else self.level_mod
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels)
        shift = self._max_children_shift()
        if len(candidate.children) == 0:
            return
        if (not self._interior and num_terminals == (1 << shift)
                and candidate.cell.level >= self.min_level):
            # all children terminal: emit the parent instead
            candidate.is_terminal = True
            candidate.children = []
            self._add_candidate(candidate)
            return
        priority = (((candidate.cell.level << shift)
                     + len(candidate.children)) << shift) + num_terminals
        self._counter += 1
        heapq.heappush(self._pq, (priority, self._counter, candidate))

    def _expand_children(self, candidate, cell: Cell, num_levels: int) -> int:
        """S2RegionCoverer::expandChildren (S2RegionCoverer.php:340-366)."""
        num_levels -= 1
        child_ids = ci.children(np.array([cell.id]))[0]
        num_terminals = 0
        for cid in child_ids:
            child_cell = Cell(int(cid))
            if num_levels > 0:
                if self._region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        candidate, child_cell, num_levels)
                continue
            child = self._new_candidate(child_cell)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _get_initial_candidates(self):
        """S2RegionCoverer::getInitialCandidates (S2RegionCoverer.php:369-421)."""
        if self.max_cells >= 4:
            cap = self._region.get_cap_bound()
            level = min(
                sphere.MIN_WIDTH.get_max_level(2 * cap.angle()),
                min(self.max_level, ci.MAX_LEVEL - 1),
            )
            if self.level_mod > 1 and level > self.min_level:
                level -= (level - self.min_level) % self.level_mod
            if level > 0:
                axis = cap.axis
                leaf = ci.from_xyz(
                    np.array([axis[0]]), np.array([axis[1]]), np.array([axis[2]]))
                base, _counts = ci.get_vertex_neighbors(leaf, level)
                for cid in base:
                    self._add_candidate(self._new_candidate(Cell(int(cid))))
                return
        for face in range(6):
            self._add_candidate(self._new_candidate(Cell.from_face(face)))

    def _get_covering_internal(self, region) -> np.ndarray:
        """S2RegionCoverer::getCoveringInternal (S2RegionCoverer.php:424-471)."""
        self._region = region
        self._result = []
        self._pq = []
        self._counter = 0
        self._candidates_created = 0
        self._get_initial_candidates()
        while self._pq and (not self._interior
                            or (len(self._result) < self.max_cells
                                and self._candidates_created
                                < self.INTERIOR_CANDIDATE_BUDGET)):
            _prio, _cnt, candidate = heapq.heappop(self._pq)
            if (candidate.cell.level < self.min_level
                    or len(candidate.children) == 1
                    or len(self._result)
                    + (0 if self._interior else len(self._pq))
                    + len(candidate.children) <= self.max_cells):
                for child in candidate.children:
                    self._add_candidate(child)
            elif self._interior:
                pass
            else:
                candidate.is_terminal = True
                candidate.children = []
                self._add_candidate(candidate)
        result = np.array(self._result, dtype=np.uint64)
        self._region = None
        self._result = None
        self._pq = None
        return result


def get_simple_covering(region, start_point: np.ndarray, level: int,
                        max_cells: int = 10000) -> np.ndarray:
    """Flood-fill covering at a fixed level from a seed point (the commented
    getSimpleCovering/floodFill spec, S2RegionCoverer.php:236-243): BFS over
    same-level neighbors keeping cells that may intersect the region."""
    from . import cellid as _ci

    seed = _ci.parent(_ci.from_xyz(np.array([start_point[0]]),
                                   np.array([start_point[1]]),
                                   np.array([start_point[2]])), level)[0]
    seen = {int(seed)}
    frontier = [int(seed)]
    out = []
    while frontier and len(out) < max_cells:
        cid = frontier.pop()
        if not region.may_intersect_cell(Cell(cid)):
            continue
        out.append(cid)
        for nbr in _ci.get_all_neighbors(cid, level):
            if int(nbr) not in seen:
                seen.add(int(nbr))
                frontier.append(int(nbr))
    return np.sort(np.array(out, dtype=np.uint64))


def covering_of(region, max_cells: int = DEFAULT_MAX_CELLS,
                min_level: int = 0, max_level: int = ci.MAX_LEVEL,
                level_mod: int = 1, interior: bool = False) -> np.ndarray:
    """One-shot convenience wrapper."""
    rc = RegionCoverer(min_level=min_level, max_level=max_level,
                       level_mod=level_mod, max_cells=max_cells)
    if interior:
        return rc.get_interior_covering(region)
    return rc.get_covering(region)
