"""Kernel unit vectors mirroring the reference's unit tests.

Sources: ocrodjvu tests/test_unicode_support.py (exact break offsets),
tests/test_text_zones.py (sexpr printing), tests/test_utils.py
(page-number grammar, UTF-8 sanitation), lib/text_zones.py semantics.
"""

import pytest

from ocrodjvu_spark.kernel import sexpr
from ocrodjvu_spark.kernel.segment import (
    simple_word_break_iterator,
    uax29_word_break_iterator,
    word_break_iterator,
)
from ocrodjvu_spark.kernel.utils import parse_page_numbers, sanitize_utf8
from ocrodjvu_spark.kernel.zones import (
    BBox,
    Zone,
    ZONE_CHARACTER,
    ZONE_LINE,
    ZONE_PAGE,
    ZONE_WORD,
    group_words,
)

TEXT = (
    '“Jekyll,” cried Utterson, with a\xa0loud voice, '
    '“I demand to see you.”'
)


class TestWordBreaks:
    def test_simple(self):
        expected = [9, 10, 15, 16, 25, 26, 30, 31, 32, 33, 37, 38, 44, 45,
                    47, 48, 54, 55, 57, 58, 61, 62, 67]
        assert list(simple_word_break_iterator(TEXT)) == expected
        assert expected[-1] == len(TEXT)

    def test_simple_empty(self):
        assert list(simple_word_break_iterator('')) == []

    def test_uax29_matches_icu_en(self):
        # golden offsets recorded from ICU in the reference's
        # tests/test_unicode_support.py:57
        expected = [1, 7, 8, 9, 10, 15, 16, 24, 25, 26, 30, 31, 32, 33, 37,
                    38, 43, 44, 45, 46, 47, 48, 54, 55, 57, 58, 61, 62, 65,
                    66, 67]
        assert list(uax29_word_break_iterator(TEXT)) == expected

    def test_uax29_simple_word(self):
        assert list(uax29_word_break_iterator('eggs')) == [4]

    def test_uax29_empty(self):
        assert list(uax29_word_break_iterator('')) == []

    def test_dispatch(self):
        assert list(word_break_iterator('a b')) == [1, 2, 3]
        assert list(word_break_iterator('a b', locale='en')) == [1, 2, 3]

    def test_uax29_ascii_wordspace_fast_path(self):
        # the [0-9A-Za-z ]* fast path must agree with the full root
        # engine (run it with a charset-excluded char appended, then
        # strip that tail boundary) for every locale family
        import random
        from ocrodjvu_spark.kernel import segment
        rng = random.Random(7)
        chars = 'abcXYZ019 '
        for _ in range(300):
            s = ''.join(rng.choice(chars)
                        for _ in range(rng.randrange(0, 24)))
            fast = list(uax29_word_break_iterator(s, locale='en'))
            # recompute via the root engine directly (bypasses the
            # fast path) — boundaries must be identical
            root = list(segment._uax29_root_iterator(s)) if s else []
            assert fast == root, (s, fast, root)

    def test_simple_word_break_unicode_spaces(self):
        # regex-run implementation: \s must keep matching exactly the
        # str.isspace() set for representative exotic whitespace
        for ws in ('\x1c', '\x1d', '\x85', '\xa0', ' ', '　'):
            assert list(simple_word_break_iterator(f'a{ws}b')) == [1, 2, 3]


class TestBBox:
    def test_union(self):
        b = BBox()
        assert not b
        b.update(BBox(10, 20, 30, 40))
        assert tuple(b) == (10, 20, 30, 40)
        b.update(BBox(5, 25, 50, 35))
        assert tuple(b) == (5, 20, 50, 40)

    def test_none_tolerant(self):
        b = BBox(1, None, 3, None)
        assert not b
        b.update(BBox(None, 2, None, 4))
        assert tuple(b) == (1, 2, 3, 4)
        assert b


class TestZoneSexpr:
    def test_swap_inverted(self):
        z = Zone(ZONE_LINE, bbox=(50, 90, 10, 60), children=['x'])
        assert z.sexpr() == ['line', 10, 60, 50, 90, 'x']

    def test_widen_degenerate(self):
        z = Zone(ZONE_LINE, bbox=(10, 10, 10, 10), children=['x'])
        assert z.sexpr() == ['line', 10, 10, 11, 11, 'x']

    def test_empty_children(self):
        z = Zone(ZONE_PAGE, bbox=(0, 0, 100, 100))
        assert z.sexpr() == ['page', 0, 0, 100, 100, '']

    def test_rotate_mirror(self):
        # golden: bbox 10 10 50 40 on a 100-high page -> (line 10 60 50 90)
        page = Zone(ZONE_PAGE, bbox=(0, 0, 100, 100), children=[
            Zone(ZONE_LINE, bbox=(10, 10, 50, 40), children=['x']),
        ])
        page.rotate(0)
        assert page.sexpr() == [
            'page', 0, 0, 100, 100, ['line', 10, 60, 50, 90, 'x']]

    @pytest.mark.parametrize('rotation', [90, 180, 270])
    def test_rotate_dims(self, rotation):
        page = Zone(ZONE_PAGE, bbox=(0, 0, 200, 100), children=[
            Zone(ZONE_LINE, bbox=(10, 10, 50, 40), children=['x']),
        ])
        page.rotate(rotation)
        s = page.sexpr()
        if rotation in (90, 270):
            assert (s[3], s[4]) == (100, 200)  # page dims swap for odd k
        else:
            assert (s[3], s[4]) == (200, 100)
        line = s[5]
        # child stays inside the rotated page
        assert 0 <= line[1] <= line[3] <= s[3]
        assert 0 <= line[2] <= line[4] <= s[4]

    def test_rotate_roundtrip_180(self):
        page = Zone(ZONE_PAGE, bbox=(0, 0, 200, 100), children=[
            Zone(ZONE_LINE, bbox=(10, 10, 50, 40), children=['x']),
        ])
        page.rotate(180)
        assert page.sexpr()[5] == ['line', 150, 10, 190, 40, 'x']


class TestGroupWords:
    def _chars(self, spec):
        return [
            Zone(ZONE_CHARACTER, bbox=bbox, children=[ch])
            for ch, bbox in spec
        ]

    def test_group_words_simple_fast_path_equivalence(self):
        # simple=True (space-run breaker) must match the generic path
        # over shapes that exercise the fast path AND every bail-out:
        # solid zones, adjacent zones, embedded spaces, boxed spaces,
        # empty-text zones, partial/inverted boxes, '' separators
        import random
        from ocrodjvu_spark.kernel.zones import ZONE_WORD
        rng = random.Random(11)
        for _ in range(400):
            items = []
            x = 0
            for _ in range(rng.randrange(1, 7)):
                roll = rng.random()
                if roll < 0.5:
                    t = ''.join(rng.choice('abc')
                                for _ in range(rng.randrange(1, 4)))
                elif roll < 0.62:
                    t = 'a b'     # embedded space: must bail
                elif roll < 0.72:
                    t = ' '       # boxed whitespace gap
                elif roll < 0.8:
                    t = ''        # zero-width zone
                else:
                    t = 'xy'
                bbox = rng.choice([
                    (x, 0, x + 10 * max(len(t), 1), 10),
                    (x + 10, 0, x, 10),      # inverted
                    (None, None, None, None),  # missing
                ])
                items.append(
                    Zone(ZONE_CHARACTER, bbox=bbox, children=[t]))
                x += 40
                if rng.random() < 0.7:
                    items.append(rng.choice([' ', '  ']))
            def run(simple):
                try:
                    out = group_words(list(items), ZONE_WORD,
                                      simple_word_break_iterator,
                                      simple=simple)
                    return [w.sexpr() for w in out]
                except Exception as exc:  # generic path may raise on
                    return type(exc).__name__  # degenerate inputs
            assert run(True) == run(False)

    def test_line_details(self):
        zones = self._chars([('a', (0, 0, 10, 10)), ('b', (10, 0, 20, 10))])
        out = group_words(zones, ZONE_LINE, simple_word_break_iterator)
        assert out == ['ab']

    def test_word_grouping(self):
        zones = self._chars([
            ('a', (0, 0, 10, 10)), (' ', (10, 0, 20, 10)),
            ('b', (20, 0, 30, 10)), ('c', (30, 0, 40, 10)),
        ])
        out = group_words(zones, ZONE_WORD, simple_word_break_iterator)
        assert [z.sexpr() for z in out] == [
            ['word', 0, 0, 10, 10, 'a'],
            ['word', 20, 0, 40, 10, 'bc'],
        ]

    def test_proportional_split(self):
        # multi-char zone: x0 + w*i//n integer interpolation
        zones = [Zone(ZONE_CHARACTER, bbox=(0, 0, 30, 10), children=['abc'])]
        out = group_words(zones, ZONE_CHARACTER, simple_word_break_iterator)
        [word] = out
        assert [c.sexpr() for c in word.children] == [
            ['char', 0, 0, 10, 10, 'a'],
            ['char', 10, 0, 20, 10, 'b'],
            ['char', 20, 0, 30, 10, 'c'],
        ]


class TestSexprText:
    def test_roundtrip_escapes(self):
        text = '(page 0 0 100 100 "eggs\\007spam")'
        value = sexpr.parse(text)
        assert value == ['page', 0, 0, 100, 100, 'eggs\x07spam']
        assert sexpr.parse(sexpr.print_compact(value)) == value

    def test_unicode_unescaped(self):
        value = ['word', 0, 0, 5, 5, 'jeż']
        printed = sexpr.print_compact(value)
        assert 'jeż' in printed
        assert sexpr.parse(printed) == value

    def test_quote_backslash(self):
        value = ['word', 0, 0, 5, 5, 'a"b\\c']
        assert sexpr.parse(sexpr.print_compact(value)) == value

    def test_pretty_width(self):
        value = ['page', 0, 0, 1000, 1000] + [
            ['line', i, 0, i + 10, 10, 'x' * 30] for i in range(8)
        ]
        printed = sexpr.print_pretty(value, width=80)
        assert all(len(line) <= 80 for line in printed.split('\n'))
        assert sexpr.parse(printed) == value

    def test_parse_many(self):
        values = sexpr.parse_many('(a 1) (b 2)\n(c 3)')
        assert values == [['a', 1], ['b', 2], ['c', 3]]


class TestUtils:
    def test_page_numbers(self):
        assert parse_page_numbers(None) is None
        assert parse_page_numbers('17') == [17]
        assert parse_page_numbers('37-42') == [37, 38, 39, 40, 41, 42]
        assert parse_page_numbers('17,37-42') == [17, 37, 38, 39, 40, 41, 42]
        assert parse_page_numbers('42-37') == []
        assert parse_page_numbers('17-17') == [17]

    def test_sanitize_utf8(self):
        assert sanitize_utf8(b'abc') == 'abc'
        assert sanitize_utf8(b'a\xffb') == 'a�b'
        assert sanitize_utf8(b'a\x01b\tc\nd\re') == 'a�b\tc\nd\re'


class TestIso639:
    def test_b_to_t(self):
        from ocrodjvu_spark.kernel.iso639 import normalize_language
        assert normalize_language('fre') == 'fra'
        assert normalize_language('ger') == 'deu'
        assert normalize_language('eng') == 'eng'

    def test_engine_aliases(self):
        from ocrodjvu_spark.kernel.iso639 import normalize_language
        assert normalize_language('ruseng') == 'rus+eng'
        assert normalize_language('RUS+ENG') == 'rus+eng'

    def test_invalid(self):
        import pytest as _pytest
        from ocrodjvu_spark.kernel.iso639 import (
            is_language_id, normalize_language)
        with _pytest.raises(ValueError):
            normalize_language('e')
        assert not is_language_id('english')
        assert is_language_id('slo')


# --- T13: filename template expansion ---------------------------------------

def test_expand_template_offsets():
    from ocrodjvu_spark.kernel.utils import expand_template
    assert expand_template('{page}', 7, 'a.djvu') == '7'
    assert expand_template('p{page+1}.txt', 7, 'a.djvu') == 'p8.txt'
    assert expand_template('p{page-2}', 7, 'a.djvu') == 'p5'
    assert expand_template('{id}', 7, 'a.djvu') == 'a.djvu'
    assert expand_template('{id-ext}_{page+10}', 7, 'a.djvu') == 'a_17'
    # non-integer base: offset field is ignored, formatter raises KeyError
    import pytest
    with pytest.raises(KeyError):
        expand_template('{id+1}', 7, 'a.djvu')


# --- T11: per-engine language tables ----------------------------------------

# the reference's fake-cuneiform inventory (tests/engines/fake-cuneiform)
CUNEIFORM_10 = ('eng ger fra rus swe spa ita ruseng ukr srp hrv pol dan '
                'por dut cze rum hun bul slo lav lit est tur').split()
CUNEIFORM_MULTI = CUNEIFORM_10 + ['rus_ger', 'rus_cze', 'rus_fra']


def test_cuneiform_language_list_parse():
    from ocrodjvu_spark.kernel.iso639 import parse_cuneiform_language_list
    out = ('Cuneiform for Linux 1.0.0\n'
           'Supported languages: eng ger ruseng slo.\n')
    assert parse_cuneiform_language_list(out) == \
        ['eng', 'ger', 'ruseng', 'slo']


def test_cuneiform_code_to_iso_quirks():
    from ocrodjvu_spark.kernel.iso639 import cuneiform_code_to_iso
    # mirror of the reference's engine tests (tests/engines/test_cuneiform)
    assert cuneiform_code_to_iso('eng', CUNEIFORM_10) == 'eng'
    assert cuneiform_code_to_iso('ger', CUNEIFORM_10) == 'deu'
    assert cuneiform_code_to_iso('ruseng', CUNEIFORM_10) == 'rus+eng'
    # cuneiform <= 1.0 bug: slo means Slovenian unless slv coexists
    assert cuneiform_code_to_iso('slo', CUNEIFORM_10) == 'slv'
    assert cuneiform_code_to_iso('slo', CUNEIFORM_10 + ['slv']) == 'slk'
    assert cuneiform_code_to_iso('rus_cze', CUNEIFORM_MULTI) == 'rus+ces'


def test_cuneiform_user_to_engine():
    from ocrodjvu_spark.kernel.iso639 import cuneiform_user_to_engine
    import pytest
    for user in ('rus+eng', 'eng+rus', 'rus-eng'):
        assert cuneiform_user_to_engine(user, CUNEIFORM_10) == 'ruseng'
    assert cuneiform_user_to_engine('deu', CUNEIFORM_10) == 'ger'
    assert cuneiform_user_to_engine('rus+ces', CUNEIFORM_MULTI) == 'rus_cze'
    assert cuneiform_user_to_engine('ces+rus', CUNEIFORM_MULTI) == 'rus_cze'
    with pytest.raises(LookupError):
        cuneiform_user_to_engine('tlh', CUNEIFORM_10)


def test_tesseract_language_tables():
    from ocrodjvu_spark.kernel.iso639 import (
        tesseract_code_to_iso, tesseract_user_to_engine)
    import pytest
    inventory = ['eng', 'deu', 'chi_tra', 'osd']
    assert tesseract_code_to_iso('chi_tra') == 'zho-tra'
    assert tesseract_code_to_iso('fre') == 'fra'
    assert tesseract_user_to_engine('eng', inventory) == 'eng'
    assert tesseract_user_to_engine('ger', inventory) == 'deu'
    assert tesseract_user_to_engine('eng+deu', inventory) == 'eng+deu'
    assert tesseract_user_to_engine('zho-tra', inventory) == 'chi_tra'
    with pytest.raises(LookupError):
        tesseract_user_to_engine('osd', inventory)
    with pytest.raises(LookupError):
        tesseract_user_to_engine('tlh', inventory)


def test_compact_sexpr_equivalence():
    # the direct zone-tree walk must serialize byte-identically to the
    # nested-list path across the whole reference corpus (including
    # degenerate/inverted boxes and empty zones)
    import glob

    from ocrodjvu_spark.kernel import hocr
    paths = sorted(glob.glob('/root/reference/tests/hocr2djvused/*.html'))
    assert paths
    n_zones = 0
    for path in paths:
        data = open(path, 'rb').read()
        try:
            zones = hocr.extract_zones(data)
        except Exception:
            continue  # malformed fixtures raise in both paths alike
        for z in zones:
            assert z.compact_sexpr() == sexpr.print_compact(z.sexpr())
            n_zones += 1
    assert n_zones > 0
    # synthetic edge cases: inverted and degenerate boxes, empty zone
    z = Zone(type=5, bbox=(10, 20, 10, 5))  # x0==x1 widen, y inverted
    assert z.compact_sexpr() == sexpr.print_compact(z.sexpr())
    z2 = Zone(type=1, bbox=(3, 3, 3, 3), children=[
        Zone(type=5, bbox=(9, 9, 1, 1), children=['a "b"\\'])])
    assert z2.compact_sexpr() == sexpr.print_compact(z2.sexpr())


def test_uax29_locale_tailoring_cldr_colon():
    from ocrodjvu_spark.kernel.segment import uax29_word_break_iterator

    def toks(text, locale=None):
        out, prev = [], 0
        for b in uax29_word_break_iterator(text, locale=locale):
            out.append(text[prev:b])
            prev = b
        return [t for t in out if t.strip()]

    # CLDR sv/fi keep the colon as MidLetter: "S:t" stays one word
    assert toks('S:t Erik', locale='sv') == ['S:t', 'Erik']
    assert toks('C:a 50', locale='fi_FI') == ['C:a', '50']
    # CLDR root (what ICU gives en / en-US-POSIX) drops it: colon splits
    assert toks('S:t Erik', locale='en_US_POSIX') == ['S', ':', 't', 'Erik']
    assert toks('S:t Erik', locale='en') == ['S', ':', 't', 'Erik']
    # untailored UCD root (locale=None): colon is MidLetter per
    # WordBreakProperty.txt, so the raw UAX#29 rules keep it
    assert toks('S:t Erik') == ['S:t', 'Erik']
    # tailoring only matters between letters (WB6/7 need AHLetter on
    # both sides) — a trailing colon splits everywhere
    assert toks('slut: ja', locale='sv') == ['slut', ':', 'ja']


def test_uax29_thai_dictionary_segmentation():
    from ocrodjvu_spark.kernel.segment import uax29_word_break_iterator

    def toks(text, locale=None):
        out, prev = [], 0
        for b in uax29_word_break_iterator(text, locale=locale):
            out.append(text[prev:b])
            prev = b
        return [t for t in out if t.strip()]

    # least-cost path over the embedded lexicon
    assert toks('สวัสดีครับ', locale='th') == ['สวัสดี', 'ครับ']
    assert toks('ภาษาไทยดีมาก', locale='th') == \
        ['ภาษา', 'ไทย', 'ดี', 'มาก']
    # full locale tags resolve to the base language
    assert toks('ผมกินข้าว', locale='th_TH') == ['ผม', 'กิน', 'ข้าว']
    # characters matching no entry merge into ONE chunk (ICU-shaped
    # unknown-run behavior), and matching resumes after it
    assert toks('ผมรักฒฒประเทศไทย', locale='th') == \
        ['ผม', 'รัก', 'ฒฒ', 'ประเทศ', 'ไทย']
    # mixed-script: Latin words keep root segmentation around the runs
    assert toks('go สวัสดีครับ now', locale='th') == \
        ['go', 'สวัสดี', 'ครับ', 'now']
    # longest match wins over a prefix entry (ทำงาน vs ทำ)
    assert toks('ทำงานดี', locale='th') == ['ทำงาน', 'ดี']
    # LEAST-COST vs GREEDY distinguishing pin: greedy longest-match
    # takes มาก ("much") first and strands the unmatchable tail ิน as
    # an unknown chunk (['มาก', 'ิน']); the Viterbi path prefers two
    # dictionary words — มา|กิน ("come eat"), cost 2+3 vs 3 + 2×10 —
    # which is also what ICU's least-cost Thai engine produces
    assert toks('มากิน', locale='th') == ['มา', 'กิน']
    # FREQUENCY vs WORD-COUNT distinguishing pin: ตากลม has two
    # complete 2-word tilings — ตา|กลม ("round eyes") and ตาก|ลม
    # ("expose to wind"). A uniform word cost ties and the longer-first
    # tie-break picks ตาก|ลม; the frequency costs (ตา 3 + กลม 4 <
    # ตาก 5 + ลม 3) pick the common reading, the way ICU's weighted
    # thaidict does
    assert toks('ตากลม', locale='th') == ['ตา', 'กลม']
    # frequency tiers must not outweigh the lexicality of compounds:
    # ทำงาน stays one word though ทำ and งาน are themselves entries
    assert toks('ทำงานมาก', locale='th') == ['ทำงาน', 'มาก']
    # no dictionary for the locale: per-grapheme root behavior (marks
    # still attach per WB4)
    assert toks('ผมกิน', locale='en') == ['ผ', 'ม', 'กิ', 'น']


def test_uax29_thai_run_end_respects_wb4():
    # a non-Thai combining mark (Extend) directly after a Thai run must
    # stay glued to the last Thai word (WB4) — the dictionary pass may
    # not insert its run-end boundary over the base rules' decision
    from ocrodjvu_spark.kernel.segment import uax29_word_break_iterator
    text = 'ไทย́ดี'
    bounds = list(uax29_word_break_iterator(text, locale='th'))
    assert bounds == [4, 6]  # 'ไทย◌́' + 'ดี'; no boundary at offset 3


def test_uax29_cjk_root_behavior():
    # DOCUMENTED DIVERGENCE from the reference's ICU (which applies a
    # CJ dictionary): root UAX#29 emits one word per ideograph /
    # Hiragana syllable and joins Katakana runs via WB13. Pinned so it
    # cannot drift silently; see SURVEY §2 W2 note.
    from ocrodjvu_spark.kernel.segment import uax29_word_break_iterator

    def toks(text, locale='en'):
        out, prev = [], 0
        for b in uax29_word_break_iterator(text, locale=locale):
            out.append(text[prev:b])
            prev = b
        return [t for t in out if t.strip()]

    assert toks('漢字カタカナかな') == ['漢', '字', 'カタカナ', 'か', 'な']
    assert toks('日本語テスト') == ['日', '本', '語', 'テスト']
    # the dictionary does NOT engage for plain zh/ja locales either —
    # only the explicit '_dict' variant opts in
    assert toks('我们学习', locale='zh') == ['我', '们', '学', '习']
    assert toks('我们学习', locale='zh_CN') == ['我', '们', '学', '习']


def test_uax29_cjk_dict_opt_in():
    # 'zh_dict' / 'ja_dict' engage the least-cost engine over the
    # embedded CJK lexicon for Han runs; Katakana keeps root WB13
    from ocrodjvu_spark.kernel.segment import uax29_word_break_iterator

    def toks(text, locale):
        out, prev = [], 0
        for b in uax29_word_break_iterator(text, locale=locale):
            out.append(text[prev:b])
            prev = b
        return [t for t in out if t.strip()]

    assert toks('我们在中国学习汉语', 'zh_dict') == \
        ['我们', '在', '中国', '学习', '汉语']
    assert toks('日本語テスト', 'ja_dict') == ['日本語', 'テスト']
    # ambiguity resolves to fewest words, longer-first on ties
    assert toks('中国人民', 'zh_dict') == ['中国', '人民']
    # Latin context around Han runs keeps root segmentation
    assert toks('see 中国 now', 'zh_dict') == ['see', '中国', 'now']
