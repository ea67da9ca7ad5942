"""hOCR -> zone-tree extraction kernel.

Re-implements the observable semantics of the reference's extraction core
(ocrodjvu lib/hocr.py:96-472): recursive DOM scan with zone classification,
bbox property parsing, engine-dialect quirks (Tesseract, Cuneiform 0.8/0.9,
OCRopus), whitespace stripping, the bbox-count/text-length reconciliation
rules, word/character splitting, and the Tesseract ``makebox`` charbox
sidecar. Pure Python, stdlib-only, deterministic — designed to run inside
Arrow-batched pandas UDFs.

Key behaviors pinned by the golden corpus (tests/):

* zone classes: ocr_page/ocr_column/ocr_carea/ocr_par/ocr_line/ocr_word/
  ocrx_block/ocrx_line/ocrx_word (lib/hocr.py:45-55); Cuneiform <= 0.8 maps
  body/p/span -> page/para/char (lib/hocr.py:57-61).
* ``title="bbox x0 y0 x1 y1"`` and ``bboxes ...`` parsing by substring
  regex search — deliberately matching ``x_bboxes`` too (lib/hocr.py:75-89).
* Tesseract strips only a trailing ``\\n\\s+``; other engines full rstrip
  (lib/hocr.py:91-111).
* bbox-count vs text-length reconciliation: exact, Cuneiform >= 0.9 extra
  whitespace boxes, OCRopus hyphen extra box (lib/hocr.py:144-154).
* single-string zones are demoted to CHARACTER for later regrouping
  (lib/hocr.py:304-308); char runs regroup into words via ``group_words``.
* page without bbox needs an external page size; page bbox must start at
  (0, 0) (lib/hocr.py:241-253).
* OCRopus 0.2 zones with no bbox and no element children are dropped
  silently (lib/hocr.py:356-367).
"""

from __future__ import annotations

import functools
import re
from typing import List, Optional, Tuple

from . import htmldom
from .segment import word_break_iterator
from .utils import sanitize_utf8
from .zones import (
    BBox,
    MalformedHocr,
    MalformedOcrOutput,
    TEXT_DETAILS_CHARACTER,
    TEXT_DETAILS_LINE,
    TEXT_DETAILS_WORD,
    ZONE_CHARACTER,
    ZONE_LINE,
    ZONE_PAGE,
    ZONE_PARAGRAPH,
    ZONE_WORD,
    ZONE_COLUMN,
    ZONE_REGION,
    Zone,
)

hocr_class_to_djvu = {
    'ocr_page': ZONE_PAGE,
    'ocr_column': ZONE_COLUMN,
    'ocr_carea': ZONE_COLUMN,
    'ocr_par': ZONE_PARAGRAPH,
    'ocr_line': ZONE_LINE,
    'ocr_word': ZONE_WORD,
    'ocrx_block': ZONE_REGION,
    'ocrx_line': ZONE_LINE,
    'ocrx_word': ZONE_WORD,
}.get

cuneiform_tag_to_djvu = {
    'body': ZONE_PAGE,
    'p': ZONE_PARAGRAPH,
    'span': ZONE_CHARACTER,
}.get

djvu_zone_to_hocr = {
    ZONE_PAGE: ('div', 'ocr_page'),
    ZONE_COLUMN: ('div', 'ocr_carea'),
    ZONE_REGION: ('div', 'ocrx_block'),
    ZONE_PARAGRAPH: ('p', 'ocr_par'),
    ZONE_LINE: ('span', 'ocrx_line'),
    ZONE_WORD: ('span', 'ocrx_word'),
}

bbox_re = re.compile(
    r'bbox\s+(?P<x0>-?\d+)\s+(?P<y0>-?\d+)\s+(?P<x1>-?\d+)\s+(?P<y1>-?\d+)'
)

bboxes_re = re.compile(
    r'bboxes\s+((?:-?\d+\s+-?\d+\s+-?\d+\s+-?\d+)'
    r'(?:,?\s*(?:-?\d+\s+-?\d+\s+-?\d+\s+-?\d+))*)'
)

_tesseract_rstrip = functools.partial(re.compile(r'\n\s+$').sub, '')

TESSERACT_SCRIPT_TYPE = 'application/x-ocrodjvu-tesseract'


class ExtractSettings:
    """Extraction configuration (lib/hocr.py:385-402).

    details: ZONE_LINE | ZONE_WORD | ZONE_CHARACTER — coarsest zone level
        emitted with coordinates.
    uax29: None for simple space-run segmentation, or a locale string /
        True for UAX #29 word segmentation.
    page_size: (w, h) fallback when the page has no bbox (Cuneiform <= 0.8).
    rotation: 0/90/180/270.
    html5 / fix_utf8: parser options (single lenient parser here; fix_utf8
        additionally scrubs control characters).
    """

    def __init__(self, rotation=0, details=TEXT_DETAILS_WORD, uax29=None,
                 html5=False, fix_utf8=False, page_size=None):
        self.rotation = rotation
        self.details = details
        if uax29 is True:
            uax29 = 'en-US-POSIX'
        self.uax29 = uax29
        self.html5 = html5
        self.fix_utf8 = fix_utf8
        self.page_size = page_size
        self.cuneiform: Optional[Tuple[int, int]] = None
        self.tesseract: Optional[bool] = None
        self.bbox_data = None  # stateful charbox iterator (makebox)


def _apply_bboxes(djvu_class, bbox_source, text, settings, page_size):
    """Reshape a text leaf into words/chars per requested detail level.

    Faithful to lib/hocr.py:96-189 including all quirk rules.
    """
    embedded_eol = False
    if djvu_class <= ZONE_LINE:
        if text.endswith('\n'):
            embedded_eol = True
    if settings.tesseract:
        # Tesseract >= 3.00 uses space for unrecognized characters; only a
        # trailing newline run is stripped.
        new_text = _tesseract_rstrip(text)
    else:
        # Cuneiform tends to attach superfluous whitespace.
        new_text = text.rstrip()
    trailing_whitespace_len = len(text) - len(new_text)
    text = new_text
    details = settings.details
    if settings.uax29 is not None and details <= TEXT_DETAILS_WORD:
        # UAX #29 needs char-level boxes internally even for word detail.
        details = TEXT_DETAILS_CHARACTER
    if details >= djvu_class:
        return [text]
    if settings.tesseract and djvu_class > ZONE_WORD and text.isspace():
        # Tesseract >= 3.0 sometimes returns series of "empty" words.
        return []
    if isinstance(bbox_source, str):
        m = bboxes_re.search(bbox_source)
        if not m:
            return [text]
        flat = [int(x) for x in m.group(1).replace(',', ' ').split()]
        coordinates = [tuple(flat[i:i + 4]) for i in range(0, len(flat) - 3, 4)]
    else:
        # charboxes from the (stateful) makebox iterator
        coordinates = []
        for ch1, (ch2, bbox, upside_down) in zip(text, bbox_source):
            if ch2 is not None and ch1 != ch2:
                raise MalformedOcrOutput(
                    'hOCR text and "makebox" output do not match')
            if upside_down < 0:
                (x0, y0, x1, y1) = bbox
                (w, h) = page_size
                bbox = (x0, h - y1, x1, h - y0)
            coordinates.append(bbox)
    if len(coordinates) == len(text):
        pass  # OK
    elif 0 < len(coordinates) - len(text) <= trailing_whitespace_len:
        # Cuneiform >= 0.9 provides boxes for some whitespace characters.
        del coordinates[len(text):]
    elif (not settings.cuneiform and not embedded_eol
            and len(coordinates) == len(text) + 1):
        # OCRopus emits one extra bbox when a line ends with a hyphen.
        del coordinates[-1]
    else:
        raise MalformedHocr("number of bboxes doesn't match text length")
    assert len(coordinates) == len(text)
    if djvu_class > ZONE_WORD:
        # Split a line-or-coarser leaf into word zones.
        words = []
        i = 0
        for j in word_break_iterator(text, settings.uax29):
            subtext = text[i:j]
            if subtext.isspace():
                i = j
                continue
            bbox = BBox()
            for k in range(i, j):
                if settings.cuneiform and coordinates[k] == (-1, -1, -1, -1):
                    raise MalformedHocr(
                        'missing bbox for non-whitespace character')
                bbox.update(coordinates[k])
            word = Zone(type=ZONE_WORD, bbox=bbox)
            words.append(word)
            if settings.details > TEXT_DETAILS_CHARACTER:
                word += [subtext]
            else:
                word += [
                    Zone(type=ZONE_CHARACTER, bbox=coordinates[k],
                         children=[text[k]])
                    for k in range(i, j)
                ]
            i = j
        return words
    else:
        # Split a word leaf into character zones.
        return [
            Zone(type=ZONE_CHARACTER, bbox=coords, children=[ch])
            for coords, ch in zip(coordinates, text)
        ]


def _scan(node, settings, page_size=None):
    """Recursive DOM walk building the zone list (lib/hocr.py:191-369)."""

    def get_children(n):
        result = []
        if n.text:
            result.append(n.text)
        for child in n:
            result += _scan(child, settings, page_size)
            if child.tail:
                result.append(child.tail)
        return result

    if not isinstance(node.tag, str) or node.tag == 'script':
        # Ignore comments, processing instructions, and script subtrees.
        return []

    title = node.get('title') or ''
    m = bbox_re.search(title)
    if m is None:
        bbox = BBox()
    else:
        gx0, gy0, gx1, gy1 = m.groups()
        bbox = BBox(int(gx0), int(gy0), int(gx1), int(gy1))

    if settings.cuneiform and settings.cuneiform <= (0, 8):
        # Cuneiform <= 0.8 doesn't mark OCR elements the hOCR way.
        djvu_class = cuneiform_tag_to_djvu(node.tag)
    else:
        hocr_classes = (node.get('class') or '').split()
        djvu_class = None
        for hocr_class in hocr_classes:
            if settings.tesseract and hocr_class == 'ocrx_word' and not bbox:
                # Some Tesseract > 3.00 versions abuse ocrx_word.
                pass
            else:
                djvu_class = hocr_class_to_djvu(hocr_class)
            if djvu_class:
                break
        else:
            if node.tag == 'p':
                # Cuneiform >= 0.9 doesn't mark paragraphs the hOCR way.
                djvu_class = cuneiform_tag_to_djvu(node.tag)

    if not djvu_class:
        return get_children(node)

    if djvu_class == ZONE_PAGE:
        if not bbox:
            if settings.page_size is None:
                raise MalformedHocr('page without bounding box information')
            page_width, page_height = page_size = settings.page_size
            bbox = BBox(0, 0, page_width, page_height)
        else:
            if (bbox.x0, bbox.y0) != (0, 0):
                raise MalformedHocr(
                    "page's bounding box should start with (0, 0)")
            page_size = (bbox.x1, bbox.y1)
    elif page_size is None:
        raise MalformedHocr('unable to determine page size')

    has_string = has_nonempty_string = False
    has_zone = has_char_zone = has_nonchar_zone = False
    children = get_children(node)
    if djvu_class == ZONE_PAGE:
        empty = [Zone(type=djvu_class, bbox=bbox)]
    else:
        empty = []
    if len(children) == 0:
        return empty

    for child in children:
        if isinstance(child, str):
            has_string = True
            if child and not child.isspace():
                has_nonempty_string = True
        elif isinstance(child, Zone):
            has_zone = True
            if child.type == ZONE_CHARACTER:
                has_char_zone = True
            else:
                has_nonchar_zone = True
        else:
            raise TypeError(
                f'Unexpected {type(child).__name__} object; '
                'expected a string or a text zone')

    if has_zone:
        if has_nonempty_string:
            raise MalformedHocr(
                'plain text intermixed with structural elements')
        if has_char_zone and has_nonchar_zone:
            raise MalformedHocr(
                'character zones intermixed with non-character zones')
        if djvu_class == ZONE_PAGE:
            pass  # the page bbox is authoritative
        else:
            bb = BBox(*bbox)
            for child in children:
                if isinstance(child, Zone):
                    bb.update(child.bbox)
            bbox = bb
        if djvu_class >= ZONE_LINE:
            if isinstance(children[-1], str) and children[-1].isspace():
                del children[-1]

    if djvu_class <= ZONE_WORD:
        if has_zone:
            return children
        elif has_string:
            if not bbox:
                raise MalformedHocr('zone without bounding box information')
            text = ''.join(children)
            children = _apply_bboxes(
                djvu_class, settings.bbox_data or title, text, settings,
                page_size)
            if len(children) == 1 and isinstance(children[0], str):
                # Demote to CHARACTER; words are regrouped at line level.
                return [Zone(type=ZONE_CHARACTER, bbox=bbox,
                             children=children)]
            else:
                return children
        else:
            raise AssertionError('word zone with neither strings nor zones')

    if not has_zone:
        assert has_string
        if settings.cuneiform and settings.cuneiform == (0, 9):
            # Cuneiform >= 0.9 hides line charboxes in a child span.ocr_cinfo.
            bboxes_node = _find_cinfo(node)
            if bboxes_node is not None and len(list(bboxes_node)) == 0 \
                    and bboxes_node.text is None:
                title = bboxes_node.get('title') or ''
        text = ''.join(children)
        children = _apply_bboxes(
            djvu_class, settings.bbox_data or title, text, settings,
            page_size)
        if len(children) == 0:
            return empty
        if isinstance(children[0], str):
            children[0] = children[0].rstrip()
            has_zone = has_nonchar_zone = has_char_zone = False
            has_string = True
        else:
            assert all(
                isinstance(child, Zone) and child.type == ZONE_WORD
                for child in children
            )
            has_zone = has_nonchar_zone = True
            has_string = has_char_zone = False

    if has_char_zone:
        from .zones import group_words
        children = group_words(
            children, settings.details,
            lambda t: word_break_iterator(t, settings.uax29))
        has_string = False
        if len(children) == 0:
            return empty

    if has_zone and has_string:
        assert not has_nonempty_string
        children = [c for c in children if not isinstance(c, str)]
        if len(children) == 0:
            return empty

    assert len(children) > 0

    if not bbox:
        if len(list(node)) == 0:
            # OCRopus 0.2 omits bbox info on some zones; drop them silently.
            return []
        if len(children) == 1:
            [child] = children
            if isinstance(child, str) and (child == '' or child.isspace()):
                return []
        raise MalformedHocr('text zone without bounding box information')

    return [Zone(type=djvu_class, bbox=bbox, children=children)]


def _find_cinfo(node):
    for child in node:
        if isinstance(child.tag, str) and child.tag == 'span' \
                and child.get('class') == 'ocr_cinfo':
            return child
    return None


def scan(node, settings) -> List[Zone]:
    """Scan a page container element into rotated page zones."""
    result = []
    for zone in _scan(node, settings, settings.page_size):
        if isinstance(zone, str):
            if zone == '' or zone.isspace():
                continue
            raise MalformedHocr(
                'plain text intermixed with structural elements')
        if not isinstance(zone, Zone):
            raise TypeError(
                f'Unexpected {type(zone).__name__}; expected a text zone')
        result.append(zone)
        zone.rotate(settings.rotation)
    return result


def extract_tesseract_bbox_data(script_text: str):
    """Yield (char, bbox, upside_down) from a ``makebox`` sidecar script.

    Format per the reference's injection (lib/engines/tesseract.py:43-50,
    parser lib/hocr.py:404-416): ``chars x0 y0 x1 y1 w`` lines, y-flipped,
    ``~`` meaning unknown char; multi-char cells are split proportionally
    with ``x0 + w*i//n`` arithmetic.
    """
    text = script_text or ''
    for line in text.splitlines():
        if not line or line.startswith('//'):
            continue
        chars, x0, y0, x1, y1, w = line.split()
        x0, y0, x1, y1 = map(int, (x0, y0, x1, y1))
        if chars == '~':
            chars = [None]
        w = x1 - x0
        n = len(chars)
        for i, ch in enumerate(chars):
            yield ch, (x0 + w * i // n, y0, x0 + w * (i + 1) // n, y1), -1


def read_document(text, settings):
    """Parse hOCR markup (str or bytes) into an element tree root."""
    if isinstance(text, bytes):
        if settings.fix_utf8:
            text = sanitize_utf8(text)
        else:
            text = text.decode('UTF-8', 'replace')
    elif settings.fix_utf8:
        text = sanitize_utf8(text)
    return htmldom.parse_html(text)


def detect_dialect(root, settings):
    """Set cuneiform/tesseract flags from <meta name="ocr-system">."""
    ocr_system = htmldom.find_meta(root, 'ocr-system')
    if ocr_system is None:
        if htmldom.find_meta(root, 'ocr-capabilities') is None:
            # ocr-system is mandatory in hOCR; assume old Cuneiform.
            settings.cuneiform = (0, 8)
    elif ocr_system.get('content') == 'openocr':
        settings.cuneiform = (0, 9)
    elif (ocr_system.get('content') or '').split()[:1] == ['tesseract']:
        settings.tesseract = True


def extract_zones(text, settings: Optional[ExtractSettings] = None,
                  **kwargs) -> List[Zone]:
    """hOCR markup -> list of page zones (one per ocr_page).

    Accepts a prebuilt ``ExtractSettings`` (the Spark UDF path reuses
    the object to report dialect on errors) or builds one from kwargs.
    This is the single implementation of dialect detection + the
    Tesseract makebox-sidecar wiring — don't duplicate it.
    """
    if settings is None:
        settings = ExtractSettings(**kwargs)
    root = read_document(text, settings)
    detect_dialect(root, settings)
    if settings.details < TEXT_DETAILS_WORD or (
            settings.uax29 and settings.details <= TEXT_DETAILS_WORD):
        script = htmldom.find_script(root, TESSERACT_SCRIPT_TYPE)
        if script is not None:
            settings.tesseract = True
            settings.bbox_data = extract_tesseract_bbox_data(script.text)
    body = root.find('body')
    if body is None:
        raise MalformedHocr('document has no body')
    return scan(body, settings)


def extract_sexprs(text, **kwargs) -> list:
    """hOCR markup -> list of page s-expression values (nested lists)."""
    return [zone.sexpr() for zone in extract_zones(text, **kwargs)]


DETAILS_BY_NAME = {
    'lines': TEXT_DETAILS_LINE,
    'words': TEXT_DETAILS_WORD,
    'chars': TEXT_DETAILS_CHARACTER,
}
