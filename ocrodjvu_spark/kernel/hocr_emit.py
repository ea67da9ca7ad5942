"""Inverse direction: DjVu hidden-text s-expression -> hOCR markup.

Re-implements the observable semantics of the reference's djvu2hocr
converter (ocrodjvu lib/cli/djvu2hocr.py:74-291):

* zone types map to (tag, class): page->div.ocr_page,
  column->div.ocr_carea, region->div.ocrx_block, para->p.ocr_par,
  line->span.ocrx_line, word->span.ocrx_word (lib/hocr.py:63-73);
* DjVu bottom-left y coordinates flip against the *real DjVu page
  height*, which may differ from the text layer's page bbox
  (lib/cli/djvu2hocr.py:88-94 — the upside-down golden pins this);
* character-level zones trigger word re-segmentation by hand
  (``break_chars``): per-char boxes interpolated with float
  ``int(x0 + w*i/n + 0.5)`` rounding — a deliberately different rounding
  rule than the forward path's ``//`` (lib/cli/djvu2hocr.py:146-185);
* with UAX#29 enabled, word/line text leaves are re-segmented too
  (``break_plain_text``, lib/cli/djvu2hocr.py:187-209);
* word elements get a single-space tail except the last child
  (lib/cli/djvu2hocr.py:244-262);
* control characters in text become
  ``<span class="djvu_char" title="#xNN"> </span>`` placeholders
  (lib/cli/djvu2hocr.py:123-144).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from .segment import word_break_iterator
from .zones import BBox, ZONE_BY_NAME, ZONE_CHARACTER, ZONE_LINE, ZONE_PAGE, ZONE_WORD
from .hocr import djvu_zone_to_hocr


class CharacterLevelDetails(Exception):
    pass


class SexprZone:
    """Read-side zone wrapper over a parsed sexpr value, with y-flip."""

    __slots__ = ('_value', '_page_height')

    def __init__(self, value: list, page_height: int):
        self._value = value
        self._page_height = page_height

    @property
    def type(self) -> int:
        return ZONE_BY_NAME[self._value[0]]

    @property
    def bbox(self) -> BBox:
        v = self._value
        return BBox(
            v[1],
            self._page_height - v[4],
            v[3],
            self._page_height - v[2],
        )

    @property
    def text(self) -> str:
        if len(self._value) != 6:
            raise TypeError(
                f'list of {len(self._value)} (!= 6) elements')
        if not isinstance(self._value[5], str):
            raise TypeError('last element is not a string')
        return self._value[5]

    @property
    def n_children(self) -> int:
        n = len(self._value) - 5
        if n <= 0:
            raise TypeError(f'list of {len(self._value)} (< 6) elements')
        return n

    @property
    def children(self):
        for child in self._value[5:]:
            if isinstance(child, list):
                yield SexprZone(child, self._page_height)
            else:
                yield self.text
                return


_xml_string_re = re.compile(
    '([^\x00-\x08\x0b\x0c\x0e-\x1f]*)'
    '([\x00-\x08\x0b\x0c\x0e-\x1f]?)'
)


def set_text(element: ET.Element, text: str):
    """Set element text, replacing non-XML control chars with djvu_char
    placeholder spans."""
    last = None
    for match in _xml_string_re.finditer(text):
        if match.group(1):
            if last is None:
                element.text = (element.text or '') + match.group(1)
            else:
                last.tail = (last.tail or '') + match.group(1)
        if match.group(2):
            last = ET.SubElement(element, 'span')
            last.set('class', 'djvu_char')
            last.set('title', '#x{0:02x}'.format(ord(match.group(2))))
            last.text = ' '


def _bbox_str(bbox) -> str:
    return ' '.join(str(c) for c in bbox)


def break_chars(char_zones, uax29):
    """Regroup character zones into word spans (with bbox + bboxes)."""
    bbox_list: List[BBox] = []
    text_parts = []
    for char_zone in char_zones:
        bbox = char_zone.bbox
        char_text = char_zone.text
        if not char_text:
            continue
        n = len(char_text)
        for i in range(n):
            subbox = BBox(
                int(bbox.x0 + (bbox.x1 - bbox.x0) * 1.0 * i / n + 0.5),
                bbox.y0,
                int(bbox.x0 + (bbox.x1 - bbox.x0) * 1.0 * (i + 1) / n + 0.5),
                bbox.y1,
            )
            bbox_list.append(subbox)
        text_parts.append(char_text)
    text = ''.join(text_parts)
    element = None
    i = 0
    for j in word_break_iterator(text, uax29):
        subtext = text[i:j]
        if subtext.isspace():
            if element is not None:
                element.tail = ' '
            i = j
            continue
        bbox = BBox()
        for k in range(i, j):
            bbox.update(bbox_list[k])
        element = ET.Element('span')
        element.set('class', 'ocrx_word')
        element.set('title', 'bbox {bbox}; bboxes {bboxes}'.format(
            bbox=_bbox_str(bbox),
            bboxes=', '.join(_bbox_str(b) for b in bbox_list[i:j]),
        ))
        set_text(element, subtext)
        yield element
        i = j


def break_plain_text(text: str, bbox: BBox, uax29):
    """Segment a plain text leaf into word spans with proportional boxes."""
    element = None
    i = 0
    n = len(text)
    for j in word_break_iterator(text, uax29):
        subtext = text[i:j]
        if subtext.isspace():
            if element is not None:
                element.tail = ' '
            i = j
            continue
        subbox = BBox(
            int(bbox.x0 + (bbox.x1 - bbox.x0) * 1.0 * i / n + 0.5),
            bbox.y0,
            int(bbox.x0 + (bbox.x1 - bbox.x0) * 1.0 * j / n + 0.5),
            bbox.y1,
        )
        element = ET.Element('span')
        element.set('class', 'ocrx_word')
        element.set('title', 'bbox ' + _bbox_str(subbox))
        set_text(element, subtext)
        yield element
        i = j


def process_zone(parent: Optional[ET.Element], zone: SexprZone, last: bool,
                 page_bbox: BBox, uax29=None) -> Optional[ET.Element]:
    zone_type = zone.type
    if zone_type <= ZONE_LINE and parent is not None:
        parent.tail = '\n'
    if zone_type == ZONE_CHARACTER:
        raise CharacterLevelDetails
    hocr_tag, hocr_class = djvu_zone_to_hocr[zone_type]
    self_elem = ET.Element(hocr_tag)
    self_elem.set('class', hocr_class)
    bbox = page_bbox if zone_type == ZONE_PAGE else zone.bbox
    self_elem.set('title', 'bbox ' + _bbox_str(bbox))
    n_children = zone.n_children
    character_level_details = False
    child_zone = None
    for n, child_zone in enumerate(zone.children):
        last_child = n == n_children - 1
        if isinstance(child_zone, SexprZone):
            try:
                process_zone(self_elem, child_zone, last=last_child,
                             page_bbox=page_bbox, uax29=uax29)
            except CharacterLevelDetails:
                character_level_details = True
                break
    if character_level_details:
        # Re-segment words by hand from the character zones.
        child = None
        for child in break_chars(zone.children, uax29):
            parent.append(child)
        if child is not None and zone_type == ZONE_WORD and not last:
            child.tail = ' '
        self_elem = None
    elif isinstance(child_zone, str):
        text = child_zone
        if zone_type >= ZONE_WORD and uax29 is not None and parent is not None:
            child = None
            for child in break_plain_text(text, bbox, uax29):
                parent.append(child)
            if child is not None and zone_type == ZONE_WORD and not last:
                child.tail = ' '
            self_elem = None
        else:
            set_text(self_elem, text)
            if zone_type == ZONE_WORD and not last:
                self_elem.tail = ' '
    if parent is not None and self_elem is not None:
        parent.append(self_elem)
    return self_elem


def sexpr_to_hocr_page(page_value: list, page_w: int, page_h: int,
                       uax29=None) -> str:
    """One page sexpr value -> hOCR page element markup (string).

    ``page_w``/``page_h`` are the real DjVu page dimensions (the reference
    reads them from ``djvused -e size``); y coordinates flip against
    ``page_h`` and the emitted page bbox is ``0 0 page_w page_h``.
    """
    if uax29 is True:
        uax29 = 'en-US-POSIX'
    page_bbox = BBox(0, 0, page_w, page_h)
    zone = SexprZone(page_value, page_h)
    element = process_zone(None, zone, last=True, page_bbox=page_bbox,
                           uax29=uax29)
    if element is None:
        return ''
    return ET.tostring(element, encoding='unicode', method='xml')


HOCR_CAPABILITIES = ' '.join(sorted(
    cls for tag, cls in djvu_zone_to_hocr.values()))

_DOC_HEADER = '''\
<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
<html xmlns="http://www.w3.org/1999/xhtml">
<head>
  <meta http-equiv="Content-Type" content="text/html; charset=UTF-8" />
  <meta name="ocr-system" content="{ocr_system}" />
  <meta name="ocr-capabilities" content="{ocr_capabilities}" />
  <title>{title}</title>
</head>
<body>
'''

_DOC_FOOTER = '''
</body>
</html>
'''


def sexpr_to_hocr_document(pages: List[Tuple[list, int, int]], uax29=None,
                           title='DjVu hidden text layer',
                           ocr_system='ocrodjvu-spark') -> str:
    """Multiple (page_value, page_w, page_h) -> complete hOCR document."""
    body = ''.join(
        sexpr_to_hocr_page(value, w, h, uax29=uax29)
        for value, w, h in pages
    )
    header = _DOC_HEADER.format(
        ocr_system=ocr_system,
        ocr_capabilities=HOCR_CAPABILITIES,
        title=title,
    )
    return header + body + _DOC_FOOTER
