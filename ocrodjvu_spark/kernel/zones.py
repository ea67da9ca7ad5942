"""Zone tree model: typed, bbox-carrying hierarchical text zones.

Semantics match the reference zone model (ocrodjvu lib/text_zones.py:38-224):

* Zone types form a total order, coarser > finer
  (page > column > region > para > line > word > char); comparisons like
  ``details >= zone_type`` drive how deep extraction splits.
* BBox is a None-tolerant (min,min,max,max) union monoid
  (lib/text_zones.py:74-81).
* On s-expression emission, inverted coordinates are swapped and degenerate
  boxes widened by one so x0<x1 and y0<y1 strictly
  (lib/text_zones.py:104-125).
* ``group_words`` folds character zones into word zones between word-break
  boundaries, splitting multi-char zones proportionally with integer
  ``x0 + w*i//n`` arithmetic (lib/text_zones.py:180-224).
* ``rotate`` mirrors hOCR top-left coordinates into DjVu bottom-left ones
  and applies a k*90-degree page rotation (lib/text_zones.py:151-178),
  reconstructed here in closed form (no djvulibre dependency).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Sequence, Union

from .sexpr import _escape_string

# --- zone types: total order, coarser is greater -------------------------

ZONE_CHARACTER = 1
ZONE_WORD = 2
ZONE_LINE = 3
ZONE_PARAGRAPH = 4
ZONE_REGION = 5
ZONE_COLUMN = 6
ZONE_PAGE = 7

TEXT_DETAILS_LINE = ZONE_LINE
TEXT_DETAILS_WORD = ZONE_WORD
TEXT_DETAILS_CHARACTER = ZONE_CHARACTER

ZONE_NAME = {
    ZONE_PAGE: 'page',
    ZONE_COLUMN: 'column',
    ZONE_REGION: 'region',
    ZONE_PARAGRAPH: 'para',
    ZONE_LINE: 'line',
    ZONE_WORD: 'word',
    ZONE_CHARACTER: 'char',
}
ZONE_BY_NAME = {v: k for k, v in ZONE_NAME.items()}


class MalformedHocr(ValueError):
    pass


class MalformedOcrOutput(ValueError):
    pass


class BBox:
    """None-tolerant bounding box with union-merge (a commutative monoid)."""

    __slots__ = ('x0', 'y0', 'x1', 'y1')

    def __init__(self, x0=None, y0=None, x1=None, y1=None):
        self.x0 = x0
        self.y0 = y0
        self.x1 = x1
        self.y1 = y1

    def __getitem__(self, i):
        return (self.x0, self.y0, self.x1, self.y1)[i]

    def __iter__(self):
        return iter((self.x0, self.y0, self.x1, self.y1))

    def __bool__(self):
        return (
            self.x0 is not None and self.y0 is not None
            and self.x1 is not None and self.y1 is not None
        )

    def __repr__(self):
        return f'BBox({self.x0!r}, {self.y0!r}, {self.x1!r}, {self.y1!r})'

    def __eq__(self, other):
        return tuple(self) == tuple(other)

    def update(self, other):
        """Union-merge: min of x0,y0 / max of x1,y1, ignoring Nones."""
        ox0, oy0, ox1, oy1 = other[0], other[1], other[2], other[3]
        if ox0 is not None and (self.x0 is None or self.x0 > ox0):
            self.x0 = ox0
        if oy0 is not None and (self.y0 is None or self.y0 > oy0):
            self.y0 = oy0
        if ox1 is not None and (self.x1 is None or self.x1 < ox1):
            self.x1 = ox1
        if oy1 is not None and (self.y1 is None or self.y1 < oy1):
            self.y1 = oy1


ZoneChild = Union['Zone', str]

# ``Zone.__init__``'s first parameter is named ``type`` (public API,
# mirrors the reference) — keep a module-level alias to the builtin.
_builtin_type = type


class Zone:
    """A typed zone with a bbox and children (sub-zones or string leaves)."""

    __slots__ = ('type', '_bbox', 'children')

    def __init__(self, type: int, bbox=None, children: Iterable[ZoneChild] = ()):
        self.type = type
        # inline the bbox property setter: __init__ runs once per zone
        # on the extraction hot path
        self._bbox = None if bbox is None else tuple(bbox)
        # a list argument is adopted without copying (every caller
        # passes a fresh list it does not reuse — audited + pinned by
        # the golden corpus); other iterables are materialized
        self.children: List[ZoneChild] = (
            children if _builtin_type(children) is list else list(children))

    @property
    def bbox(self):
        return self._bbox

    @bbox.setter
    def bbox(self, bbox):
        self._bbox = None if bbox is None else tuple(bbox)

    def __iter__(self):
        return iter(self.children)

    def __iadd__(self, new_children):
        self.children += list(new_children)
        return self

    def __getitem__(self, n):
        return self.children[n]

    def __len__(self):
        return len(self.children)

    def __repr__(self):
        return (
            f'Zone(type={ZONE_NAME.get(self.type, self.type)}, '
            f'bbox={self._bbox!r}, children={self.children!r})'
        )

    def sexpr(self):
        """Emit the nested-list s-expression value for this zone.

        Returns ``[type_name, x0, y0, x1, y1, child...]`` where children are
        either nested lists or strings; an empty child list becomes one ""
        leaf, inverted coordinates are swapped, and degenerate boxes are
        widened by 1 (strict x0<x1, y0<y1).
        """
        children = [
            child.sexpr() if isinstance(child, Zone) else child
            for child in self.children
        ] or ['']
        x0, y0, x1, y1 = self._bbox
        if x0 > x1:
            x0, x1 = x1, x0
        elif x0 == x1:
            x1 += 1
        if y0 > y1:
            y0, y1 = y1, y0
        elif y0 == y1:
            y1 += 1
        return [ZONE_NAME[self.type], x0, y0, x1, y1] + children

    def compact_sexpr(self) -> str:
        """Single-line serialization, identical to
        ``sexpr.print_compact(self.sexpr())`` (pinned by
        tests/test_kernel_units.py::test_compact_sexpr_equivalence) but
        walking the zone tree directly — the nested-list intermediate
        that ``sexpr()`` builds is pure allocation overhead on the
        extraction hot path."""
        out: List[str] = []
        self._compact_into(out)
        return ''.join(out)

    def _compact_into(self, out: List[str]) -> None:
        x0, y0, x1, y1 = self._bbox
        if x0 > x1:
            x0, x1 = x1, x0
        elif x0 == x1:
            x1 += 1
        if y0 > y1:
            y0, y1 = y1, y0
        elif y0 == y1:
            y1 += 1
        children = self.children
        if len(children) == 1 and _builtin_type(children[0]) is str:
            # dominant case (word/char leaf): emit in one fragment
            out.append(f'({ZONE_NAME[self.type]} {x0} {y0} {x1} {y1} '
                       f'{_escape_string(children[0])})')
            return
        out.append(f'({ZONE_NAME[self.type]} {x0} {y0} {x1} {y1}')
        if children:
            escape = _escape_string
            append = out.append
            for child in children:
                append(' ')
                if _builtin_type(child) is Zone:
                    child._compact_into(out)
                else:
                    append(escape(child))
        else:
            out.append(' ""')  # sexpr() emits one empty-string leaf
        out.append(')')

    def rotate(self, rotation: int, xform=None):
        """Transform hOCR top-left coords to DjVu bottom-left, rotated.

        The exterior call must be on a page zone whose bbox starts at (0,0);
        children reuse the page-level transform. ``rotation`` is a multiple
        of 90 (degrees, counter-clockwise render rotation being undone).
        """
        if xform is None:
            assert self.type == ZONE_PAGE, 'exterior zone must be a page'
            assert self._bbox[:2] == (0, 0), 'page bbox must start at (0, 0)'
            w, h = self._bbox[2:]
            xform = _InverseRotation(rotation, w, h)
            if xform.k == 0:
                # the dominant rotation=0 case is a pure y-mirror:
                # specialized walk, same min/max normalization as the
                # generic transform (pinned by test_rotate_* and the
                # goldens)
                self._mirror_y(h)
                return
        x0, y0 = xform(self._bbox[0], self._bbox[1])
        x1, y1 = xform(self._bbox[2], self._bbox[3])
        if x0 > x1:
            x0, x1 = x1, x0
        if y0 > y1:
            y0, y1 = y1, y0
        self.bbox = (x0, y0, x1, y1)
        for child in self.children:
            if isinstance(child, Zone):
                child.rotate(rotation, xform)

    def _mirror_y(self, h: int):
        """rotation=0 specialization of ``rotate``: y' = h - y with the
        same swap normalization (equivalent to the k=0 xform path)."""
        x0, y0, x1, y1 = self._bbox
        if x0 > x1:
            x0, x1 = x1, x0
        ny0 = h - y1
        ny1 = h - y0
        if ny0 > ny1:
            ny0, ny1 = ny1, ny0
        self._bbox = (x0, ny0, x1, ny1)
        for child in self.children:
            if isinstance(child, Zone):
                child._mirror_y(h)


class _InverseRotation:
    """Map hOCR top-left page coords back to DjVu bottom-left page coords.

    The hOCR page of size (w, h) is the k*90-degree counter-clockwise
    rendering of a DjVu page; for odd k the DjVu page has swapped
    dimensions. For k == 0 this reduces to the y-mirror y' = h - y
    (matching the reference's golden: input line ``bbox 10 10 50 40`` on a
    100-high page emits ``(line 10 60 50 90 ...)``).
    """

    __slots__ = ('k', 'w', 'h')

    def __init__(self, rotation: int, w: int, h: int):
        if rotation % 90:
            raise ValueError('rotation must be a multiple of 90')
        self.k = (rotation // 90) & 3
        self.w = w
        self.h = h

    def __call__(self, xh, yh):
        w, h, k = self.w, self.h, self.k
        # top-left -> bottom-left in the rendered frame
        xr, yr = xh, h - yh
        if k == 0:
            return xr, yr
        if k == 1:
            # rendered = DjVu page (h, w) rotated 90 CCW: (xd,yd)->(Hd-yd, xd)
            # with DjVu dims (Wd, Hd) = (h, w)
            return yr, w - xr
        if k == 2:
            return w - xr, h - yr
        # k == 3 (270 CCW): (xd,yd)->(yd, Wd-xd) with (Wd,Hd)=(h,w)
        return h - yr, xr


_HAS_WS = re.compile(r'\s')


def _group_solid_words(zones) -> 'list | None':
    """O(zones) regrouping for the dominant shape: solid text zones
    separated by whitespace-only strings. Returns None when the shape
    does not hold (zones that touch, embedded whitespace, empty-text
    adjacency, partial/inverted boxes on multi-char zones) — the
    caller then runs the generic path."""
    words = []
    append = words.append
    prev_zone = False
    for z in zones:
        if _builtin_type(z) is str:
            if not z:
                # generic path raises IndexError on ''[0] — preserve
                # that behavior by falling back
                return None
            prev_zone = False  # whitespace separator
            continue
        t = z.children[0] if z.children else None
        if _builtin_type(t) is not str:
            return None
        if not t:
            # zero-width zone: contributes nothing AND no separation
            continue
        if _HAS_WS.search(t) is not None:
            if t.isspace():
                prev_zone = False  # boxed whitespace acts as a gap
                continue
            return None  # mixed text: needs per-char splitting
        if prev_zone:
            return None  # adjacent solid zones merge into one word
        bb = z._bbox
        if len(t) > 1 and not (
                bb is not None and bb[0] is not None
                and bb[2] is not None and bb[0] <= bb[2]):
            return None  # generic path re-derives from the char split
        append(Zone(type=ZONE_WORD, bbox=bb, children=[t]))
        prev_zone = True
    return words


def group_words(zones: Sequence, details: int, word_break_iterator,
                simple: bool = False) -> list:
    """Fold a run of character zones (plus whitespace strings) into words.

    ``zones`` is a sequence of CHARACTER zones whose single child is a text
    fragment, possibly interleaved with whitespace-only strings.
    ``word_break_iterator`` is a callable text -> iterator of boundary
    offsets. Multi-char zones are split into per-char boxes with integer
    ``x0 + w*i//n`` interpolation before regrouping.
    Returns word zones, or ``[text]`` if only line detail was requested.

    ``simple=True`` asserts the breaker is the space-run segmenter
    (``uax29 is None``), enabling an O(zones) fast path when every zone
    is a solid (whitespace-free) fragment separated by whitespace —
    each zone is then exactly one word with its own bbox, matching the
    generic path's single-zone-segment shortcut. Any other shape falls
    back to the generic O(chars) path with identical results (pinned
    by test_group_words_simple_fast_path_equivalence).
    """
    if simple and details == TEXT_DETAILS_WORD:
        fast = _group_solid_words(zones)
        if fast is not None:
            return fast
    # z[0] is the first character for plain strings and the first (text)
    # child for zones — faithful to the reference's indexing semantics.
    text = ''.join(z[0] for z in zones)
    if details > TEXT_DETAILS_WORD:
        return [text]
    # zone ranges over the concatenated text; per-char boxes come from
    # the reference's x0 + w*i//m proportional split, but we only
    # materialize them lazily per segment (and skip even that when a
    # word segment covers exactly one zone: the union of a full
    # proportional split is the zone's own bbox)
    ranges = []  # (start, end, bbox-or-None)
    start = 0
    for zone in zones:
        m = len(zone[0])
        ranges.append(
            (start, start + m, None if isinstance(zone, str) else zone.bbox))
        start += m
    assert start == len(text)

    def char_box(k):
        # proportional sub-box of character k within its owning zone
        lo, hi = 0, len(ranges)
        while lo < hi - 1:
            mid = (lo + hi) // 2
            if ranges[mid][0] <= k:
                lo = mid
            else:
                hi = mid
        s, e, bbox = ranges[lo]
        m = e - s
        if m == 1:
            return bbox
        x0, y0, x1, y1 = bbox
        w = x1 - x0
        n = k - s
        return (x0 + w * n // m, y0, x0 + w * (n + 1) // m, y1)

    words = []
    words_append = words.append
    word_detail = details > TEXT_DETAILS_CHARACTER
    i = 0
    r = 0  # range cursor (segments are visited in order)
    n_ranges = len(ranges)
    for j in word_break_iterator(text):
        subtext = text[i:j]
        if subtext.isspace():
            i = j
            continue
        while r < n_ranges - 1 and ranges[r][1] <= i:
            r += 1
        seg_start, seg_end, seg_bbox = ranges[r]
        if seg_start == i and seg_end == j and (
                seg_end - seg_start == 1
                or (seg_bbox is not None
                    and seg_bbox[0] is not None and seg_bbox[2] is not None
                    and seg_bbox[0] <= seg_bbox[2])):
            # fast path: the segment is exactly one zone, and the union
            # of its full proportional split is the zone bbox itself
            # (guarded against inverted/partial boxes, where the split
            # union differs)
            bbox = seg_bbox
        else:
            # None-tolerant union (BBox.update semantics)
            bx0 = by0 = bx1 = by1 = None
            for k in range(i, j):
                cx0, cy0, cx1, cy1 = char_box(k)
                if cx0 is not None and (bx0 is None or bx0 > cx0):
                    bx0 = cx0
                if cy0 is not None and (by0 is None or by0 > cy0):
                    by0 = cy0
                if cx1 is not None and (bx1 is None or bx1 < cx1):
                    bx1 = cx1
                if cy1 is not None and (by1 is None or by1 < cy1):
                    by1 = cy1
            bbox = (bx0, by0, bx1, by1)
        if word_detail:
            inner = [subtext]
        else:
            inner = [
                Zone(type=ZONE_CHARACTER, bbox=char_box(k),
                     children=[text[k]])
                for k in range(i, j)
            ]
        words_append(Zone(type=ZONE_WORD, bbox=bbox, children=inner))
        i = j
    return words
