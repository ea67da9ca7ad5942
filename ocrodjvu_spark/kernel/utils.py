"""Small shared utilities: UTF-8 sanitation, page-range grammar."""

from __future__ import annotations

import re
from typing import List, Optional

_control_chars_re = re.compile(
    '[{0}]'.format(''.join(
        ch for ch in map(chr, range(32)) if ch not in '\n\r\t'
    ))
)


def sanitize_utf8(data) -> str:
    """Replace invalid UTF-8 sequences and control characters (except CR,
    LF, TAB) with U+FFFD. Accepts bytes or str.

    Mirrors the reference sanitizer (ocrodjvu lib/utils.py:83-114).
    """
    if isinstance(data, bytes):
        text = data.decode('UTF-8', 'replace')
    else:
        text = data
    return _control_chars_re.sub('\N{REPLACEMENT CHARACTER}', text)


def parse_page_numbers(pages: Optional[str]) -> Optional[List[int]]:
    """``'17,37-42'`` -> ``[17, 37, 38, ..., 42]``; ``'42-37'`` -> ``[]``.

    Mirrors ocrodjvu lib/utils.py:35-53.
    """
    if pages is None:
        return None
    result: List[int] = []
    for page_range in pages.split(','):
        if '-' in page_range:
            x, y = map(int, page_range.split('-', 1))
            result += range(x, y + 1)
        else:
            result.append(int(page_range, 10))
    return result


# --- filename template expansion (T13) --------------------------------------

_TEMPLATE_OFFSET_RE = re.compile(r'^(?P<base>.+?)(?P<sign>[+-])(?P<off>\d+)$')


def expand_template(template: str, page_no: int, page_id: str) -> str:
    """Expand a ``{page+1}``-style filename template.

    Grammar per the reference's raw-OCR save path
    (lib/cli/ocrodjvu.py:145-174): fields ``page`` (int), ``id`` and
    ``id-ext`` (strings), plus ``{base+N}`` / ``{base-N}`` integer offset
    arithmetic on any int-valued field. Unknown or non-integer offset
    fields are left to the formatter (a KeyError surfaces like any bad
    format string).
    """
    import os
    import string
    values = {
        'page': page_no,
        'id': page_id,
        'id-ext': os.path.splitext(page_id)[0],
    }
    fmt = string.Formatter()
    for _literal, field, _spec, _conv in fmt.parse(template):
        if field is None or field in values:
            continue
        m = _TEMPLATE_OFFSET_RE.match(field)
        if m is None:
            continue
        base = values.get(m.group('base'))
        if not isinstance(base, int):
            continue
        delta = int(m.group('off'), 10)
        values[field] = base + delta if m.group('sign') == '+' else \
            base - delta
    return fmt.vformat(template, (), values)
