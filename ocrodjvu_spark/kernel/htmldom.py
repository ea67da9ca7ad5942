"""Lenient HTML -> element-tree parser built on the stdlib html.parser.

Produces ``xml.etree.ElementTree`` elements with lxml-compatible accessors
used by the scan kernel (``text``/``tail``/iteration/``get``). Reproduces
the libxml2 recovery behaviors the hOCR corpus depends on:

* void elements (meta, img, br, ...) never take children;
* a block-level start tag (p, h1-h6, div, ul, table, ...) implicitly
  closes an open ``<p>`` — this is why a stray ``<h3>`` inside
  ``<p class=ocr_par>`` splits the paragraph in the OCRopus fixtures
  (reference evidence: ocrodjvu tests/hocr2djvused/alice_ocropus0.3.1.html
  vs its .test1 golden, where the first five lines are emitted as direct
  page children);
* unmatched end tags are ignored; end tags close intermediate open
  elements up to the nearest match;
* ``<script>`` content is kept verbatim as the element's text (needed for
  the Tesseract ``makebox`` charbox sidecar);
* comments are preserved as non-string-tag nodes so their tails still
  contribute text, matching lxml iteration semantics.

Tag and attribute names are lowercased; character references are decoded
outside CDATA content.
"""

from __future__ import annotations

import html.parser
import xml.etree.ElementTree as ET

VOID_ELEMENTS = frozenset((
    'area', 'base', 'basefont', 'br', 'col', 'embed', 'frame', 'hr', 'img',
    'input', 'isindex', 'link', 'meta', 'param', 'source', 'track', 'wbr',
))

# start tags that implicitly close an open <p> (HTML4 block-level content
# not allowed inside a paragraph)
_P_CLOSERS = frozenset((
    'address', 'article', 'aside', 'blockquote', 'details', 'div', 'dl',
    'fieldset', 'figcaption', 'figure', 'footer', 'form',
    'h1', 'h2', 'h3', 'h4', 'h5', 'h6', 'header', 'hr', 'main', 'menu',
    'nav', 'ol', 'p', 'pre', 'section', 'table', 'ul',
))

# elements whose start tag implies closing same-name ancestors
_SELF_NESTING_CLOSERS = frozenset(('li', 'td', 'th', 'tr', 'option'))

_STRUCTURE = ('html', 'head', 'body')


class _TreeBuilder(html.parser.HTMLParser):

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = ET.Element('html')
        self._stack = [self.root]
        self._last: ET.Element | None = None  # for tail attribution

    # -- helpers ----------------------------------------------------------

    def _top(self) -> ET.Element:
        return self._stack[-1]

    def _open_names(self):
        return [e.tag for e in self._stack if isinstance(e.tag, str)]

    def _append(self, elem: ET.Element):
        self._top().append(elem)

    def _add_text(self, data: str):
        top = self._top()
        children = list(top)
        if children:
            last = children[-1]
            last.tail = (last.tail or '') + data
        else:
            top.text = (top.text or '') + data

    def _implied_close(self, tag: str):
        open_names = [e.tag for e in self._stack]
        if tag in _P_CLOSERS and 'p' in open_names:
            # close up to and including the innermost <p>, but never cross
            # structural containers
            for elem in reversed(self._stack[1:]):
                if elem.tag in _STRUCTURE:
                    break
                if elem.tag == 'p':
                    while self._stack[-1] is not elem:
                        self._stack.pop()
                    self._stack.pop()
                    break
        if tag in _SELF_NESTING_CLOSERS:
            for elem in reversed(self._stack[1:]):
                if elem.tag in _STRUCTURE:
                    break
                if elem.tag == tag:
                    while self._stack[-1] is not elem:
                        self._stack.pop()
                    self._stack.pop()
                    break

    # -- parser callbacks --------------------------------------------------

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == 'html':
            # merge attributes into the synthetic root
            for k, v in attrs:
                if k and self.root.get(k) is None:
                    self.root.set(k.lower(), v if v is not None else '')
            return
        self._implied_close(tag)
        if tag in ('head', 'body'):
            # singleton structural elements directly under the root
            for child in self.root:
                if child.tag == tag:
                    self._stack = [self.root, child]
                    return
            elem = ET.SubElement(self.root, tag)
            for k, v in attrs:
                if k:
                    elem.set(k.lower(), v if v is not None else '')
            self._stack = [self.root, elem]
            return
        elem = ET.Element(tag)
        for k, v in attrs:
            if k and elem.get(k.lower()) is None:
                elem.set(k.lower(), v if v is not None else '')
        self._ensure_container(tag)
        self._append(elem)
        if tag not in VOID_ELEMENTS:
            self._stack.append(elem)

    def _ensure_container(self, tag: str):
        """Put stray content under head or body like a recovering parser."""
        if self._top() is self.root:
            section = 'head' if tag in (
                'title', 'meta', 'link', 'style', 'base') else 'body'
            self.handle_starttag(section, [])

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        if tag in VOID_ELEMENTS or tag not in ('html', 'head', 'body'):
            self.handle_starttag(tag, attrs)
            if tag not in VOID_ELEMENTS:
                self.handle_endtag(tag)
        else:
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == 'html':
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if not data:
            return
        if self._top() is self.root:
            if data.isspace():
                return
            self._ensure_container('span')
        self._add_text(data)

    def handle_comment(self, data):
        if self._top() is self.root:
            return
        comment = ET.Comment(data)
        self._append(comment)

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass

    def unknown_decl(self, data):
        pass


def parse_html(text: str) -> ET.Element:
    """Parse (possibly malformed) HTML text into an element tree root."""
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


def find_meta(root: ET.Element, name: str):
    """Equivalent of lxml doc.find('/head/meta[@name=...]')."""
    head = root.find('head')
    if head is None:
        return None
    for meta in head.iter('meta'):
        if meta.get('name') == name:
            return meta
    return None


def find_script(root: ET.Element, type_: str):
    """Equivalent of doc.find('//script[@type=...]')."""
    for script in root.iter('script'):
        if script.get('type') == type_:
            return script
    return None
