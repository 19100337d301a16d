"""Row-for-row parity tests for the pure-Python PLSS kernels.

Golden inputs/outputs are frozen from the reference's own unit tests
(JamesPImes/pyTRS v2.2.1) -- citations per table:

- TRS codec:        reference tests/test_trs.py:27-160
- tract parse:      reference tests/test_tract_and_parse.py:24-88,252-495
- preprocess:       reference tests/test_tract_preprocess.py:28-108,
                    tests/test_plss_preprocess.py:24-122
- document parse:   reference tests/test_plssdesc_and_parse.py:25-249
"""

import pytest

from pytrs_spark.plss.aliquot import parse_aliquot
from pytrs_spark.plss.document import (
    deduce_layout,
    find_twprge,
    parse_document,
    preprocess_plss,
)
from pytrs_spark.plss.simplify import simplify_aliquots
from pytrs_spark.plss.tract import (
    parse_tract,
    remove_aliquot_interveners,
    scrub_aliquots,
)
from pytrs_spark.plss.trs import (
    pretty_twprge,
    trs_compose,
    trs_decompose,
    twprge_natural_to_short,
    twprge_short_to_natural,
)


class TestTRSCodec:
    def test_compose(self):
        for twp, rge, sec in [('154n', '97w', '1'), ('154', '97', '1'),
                              (154, 97, 1)]:
            assert trs_compose(twp, rge, sec) == '154n97w01'
        for twp, rge, sec in [('154s', '97e', '1'), ('154', '97', '1'),
                              (154, 97, 1)]:
            assert trs_compose(twp, rge, sec, default_ns='s',
                               default_ew='e') == '154s97e01'

    def test_decompose_valid(self):
        assert trs_decompose('154n97w01') == {
            'trs': '154n97w01',
            'twp': '154n', 'twp_num': 154, 'twp_ns': 'n',
            'twp_undef': False,
            'rge': '97w', 'rge_num': 97, 'rge_ew': 'w', 'rge_undef': False,
            'sec': '01', 'sec_num': 1, 'sec_undef': False,
        }

    def test_decompose_undef(self):
        d = trs_decompose(None)
        assert d['trs'] == '___z___z__'
        assert d['twp_undef'] and d['rge_undef'] and d['sec_undef']
        assert d['twp_num'] is None and d['sec_num'] is None

    def test_decompose_error(self):
        d = trs_decompose('asdf')
        assert d['trs'] == 'XXXzXXXzXX'
        assert not (d['twp_undef'] or d['rge_undef'] or d['sec_undef'])
        assert d['twp_num'] is None and d['sec_num'] is None

    def test_error_twprge_collapses_sec(self):
        # Case-sensitive 'XXXz' sentinel dies on the lowercase round
        # trip, collapsing the whole key (reference trs.py:594-601).
        assert trs_decompose('XXXzXXXz36')['trs'] == 'XXXzXXXzXX'

    def test_pretty(self):
        custom = dict(t='Twp ', r='Rge ', delim=', ', n=' North',
                      s=' South', e=' East', w=' West', undef='___X')
        assert pretty_twprge(trs_decompose('154n97w14')) == 'T154N-R97W'
        assert pretty_twprge(trs_decompose('154n97w14'), **custom) \
            == 'Twp 154 North, Rge 97 West'
        assert pretty_twprge(trs_decompose('154s97e14')) == 'T154S-R97E'
        assert pretty_twprge(trs_decompose(None)) == 'T---X-R---X'
        assert pretty_twprge(trs_decompose(None), **custom) \
            == 'Twp ___X, Rge ___X'

    def test_natural_short(self):
        pairs = {'T154N-R97W': '154n97w', 'T1N-R7E': '1n7e',
                 'T154S-R97W': '154s97w', 'T1S-R7W': '1s7w'}
        for natural, short in pairs.items():
            assert twprge_natural_to_short(natural) == short
            assert twprge_short_to_natural(short) == natural


class TestAliquotParse:
    def test_basic(self):
        assert parse_aliquot('S½N½') == ['SENE', 'SWNE', 'SENW', 'SWNW']
        assert parse_aliquot('SE¼SE¼') == ['SESE']

    def test_depth_min(self):
        assert parse_aliquot('N½', qq_depth_min=1) == ['NE', 'NW']
        assert parse_aliquot('N½', qq_depth_min=2) == [
            'NENE', 'NWNE', 'SENE', 'SWNE',
            'NENW', 'NWNW', 'SENW', 'SWNW']
        assert parse_aliquot('N½', qq_depth_min=3) == [
            'NENENE', 'NWNENE', 'SENENE', 'SWNENE',
            'NENWNE', 'NWNWNE', 'SENWNE', 'SWNWNE',
            'NESENE', 'NWSENE', 'SESENE', 'SWSENE',
            'NESWNE', 'NWSWNE', 'SESWNE', 'SWSWNE',
            'NENENW', 'NWNENW', 'SENENW', 'SWNENW',
            'NENWNW', 'NWNWNW', 'SENWNW', 'SWNWNW',
            'NESENW', 'NWSENW', 'SESENW', 'SWSENW',
            'NESWNW', 'NWSWNW', 'SESWNW', 'SWSWNW']


class TestTractPreprocess:
    def test_intervener_removal(self):
        table = {
            'N½ of the S½': 'N½S½',
            'NE¼ of the SW¼': 'NE¼SW¼',
            'NE¼ of SW¼': 'NE¼SW¼',
            'NE¼ SW¼': 'NE¼SW¼',
            'N½ of NE¼ of the SW¼': 'N½NE¼SW¼',
            'N½ of the NE¼ of SW¼': 'N½NE¼SW¼',
            'N½ NE¼ SW¼': 'N½NE¼SW¼',
        }
        for txt, expected in table.items():
            assert remove_aliquot_interveners(txt) == expected

    def test_scrub(self):
        table = {
            'Lot 1 of SE/4 of the NW/4': 'Lot 1 of SE¼NW¼',
            'Southeast Quarter of the Northeast Quarter': 'SE¼NE¼',
            'One Hundred Feet': 'One Hundred Feet',
            'NENE': 'NENE',
            'S2NE': 'S½NE¼',
            'S2NENW': 'S½NE¼NW¼',
            'N2 of NE of NW, NW': 'N½NE¼NW¼, NW',
        }
        for txt, expected in table.items():
            assert scrub_aliquots(txt) == expected

    def test_scrub_clean_qq(self):
        table = {
            'Lot 1 of SE/4 of the NW/4': 'Lot 1 of SE¼NW¼',
            'Southeast Quarter of the Northeast Quarter': 'SE¼NE¼',
            'NENE': 'NE¼NE¼',
            'S2NE': 'S½NE¼',
            'S2NENW': 'S½NE¼NW¼',
            'N2 of NE of NW, NW': 'N½NE¼NW¼, NW¼',
            'S½N½ SW': 'S½N½SW¼',
            'S2SE, E2SW': 'S½SE¼, E½SW¼',
        }
        for txt, expected in table.items():
            assert scrub_aliquots(txt, clean_qq=True) == expected


class TestTractParse:
    def test_basic(self):
        r = parse_tract('Lots 1 - 3, S/2N/2, Lot 8(39.21), SE/4SE/4')
        assert r['lots'] == ['L1', 'L2', 'L3', 'L8']
        assert r['lot_acres'] == {'L8': '39.21'}
        assert r['qqs'] == ['SENE', 'SWNE', 'SENW', 'SWNW', 'SESE']

    def test_clean_qq(self):
        table = {
            'Lot 1 of SE/4 of the NW/4': ['L1', 'SENW'],
            'Southeast Quarter of the Northeast Quarter': ['SENE'],
            'Lots 1 - 3, NENE': ['L1', 'L2', 'L3', 'NENE'],
            'S2NE': ['SENE', 'SWNE'],
            'S2NENW, Lot 7': ['L7', 'S2NENW'],
            'N2 of NE of NW, NW':
                ['N2NENW', 'NENW', 'NWNW', 'SENW', 'SWNW'],
            'S½N½ SW': ['S2NESW', 'S2NWSW'],
        }
        for txt, expected in table.items():
            r = parse_tract(txt, clean_qq=True)
            assert r['lots'] + r['qqs'] == expected, txt

    def test_lot_divs(self):
        with_divs = {
            'N/2 of Lot 1, Lot 3, E/2SW/4 of Lot 7':
                ['N2 of L1', 'L3', 'E2SW of L7'],
            'Lot 5, N/2 of Lots 1 - 3':
                ['L5', 'N2 of L1', 'N2 of L2', 'N2 of L3'],
        }
        without_divs = {
            'N/2 of Lot 1, Lot 3, E/2SW/4 of Lot 7': ['L1', 'L3', 'L7'],
            'Lot 5, N/2 of Lots 1 - 3': ['L5', 'L1', 'L2', 'L3'],
        }
        for txt, expected in with_divs.items():
            assert parse_tract(txt)['lots'] == expected
        for txt, expected in without_divs.items():
            assert parse_tract(txt, suppress_lot_divs=True)['lots'] \
                == expected

    def test_qq_depth_max(self):
        txt = 'S/2N/2NW/4SW/4, SE/4SE/4'
        assert parse_tract(txt, qq_depth_max=2)['qqs'] == ['NWSW', 'SESE']
        assert parse_tract(txt, qq_depth_max=3)['qqs'] == \
            ['N2NWSW', 'SESE']
        assert parse_tract(txt, qq_depth_max=4)['qqs'] == \
            ['S2N2NWSW', 'SESE']

    def test_qq_depth_exact(self):
        txt = 'S/2N/2NW/4SW/4, SE/4SE/4'
        assert parse_tract(txt, qq_depth=1)['qqs'] == ['SW', 'SE']
        assert parse_tract(txt, qq_depth=2)['qqs'] == ['NWSW', 'SESE']
        assert parse_tract(txt, qq_depth=3)['qqs'] == \
            ['NENWSW', 'NWNWSW', 'NESESE', 'NWSESE', 'SESESE', 'SWSESE']

    def test_break_halves(self):
        txt = 'N/2NW/4SW/4, SE/4SE/4'
        assert parse_tract(txt)['qqs'] == ['N2NWSW', 'SESE']
        assert parse_tract(txt, break_halves=True)['qqs'] == \
            ['NENWSW', 'NWNWSW', 'SESE']

    def test_dup_flags(self):
        r = parse_tract('Lots 1 - 3, NW/4, Lot 2, Lot 1, NE/4NW/4, SW/4NW/4')
        assert 'dup_lot<L1,L2>' in r['w_flags']
        assert ('dup_lot<L1,L2>', 'dup_lot<L1,L2>') in r['w_flag_lines']
        assert 'dup_qq<NENW,SWNW>' in r['w_flags']

    def test_lots_qqs_order(self):
        r = parse_tract('Lots 1 - 3, S/2NE/4, Lot 5, Lot 1')
        assert r['lots'] + r['qqs'] == \
            ['L1', 'L2', 'L3', 'L5', 'L1', 'SENE', 'SWNE']


class TestSimplify:
    def test_simplify(self):
        r = parse_tract(
            'S2SW, NENE, NWNE, NESW, NWSW, N2SENE, SWSENE, SESENE, '
            'SWNW, SESWNE', clean_qq=True)
        assert simplify_aliquots(r['qqs']) == \
            ['N2NE', 'SENE', 'SESWNE', 'SWNW', 'SW']

    def test_nonstandard(self):
        r = parse_tract('E2, W2', clean_qq=True)
        assert simplify_aliquots(r['qqs']) == ['N2', 'S2']

    def test_standard(self):
        r = parse_tract('E2, W2', clean_qq=True)
        assert simplify_aliquots(r['qqs'], assume_standard=True) == ['ALL']

    def test_empty(self):
        r = parse_tract('asdf', clean_qq=True)
        assert simplify_aliquots(r['qqs']) == []


class TestPLSSPreprocess:
    def test_twprge_canonicalization(self):
        for txt in ('Township 154 North, Range 97 West Sec 14: NE/4',
                    'T154N-R97W Sec 14: NE/4',
                    '154N-97W Sec 14: NE/4',
                    'T154-R97 Sec 14: NE/4',
                    '154N-R97 Sec 14: NE/4'):
            assert preprocess_plss(txt)[0] == 'T154N-R97W Sec 14: NE/4'

    def test_pm_scrub(self):
        got, _ = preprocess_plss('T154N-R97W, 5th P.M., Sec 14: NE/4')
        assert got == 'T154N-R97W Sec 14: NE/4'

    def test_ocr_scrub(self):
        txt = ('Township lS4 North, Range 97 West\nSection 14: NE/4\n'
               'Township 1SS North, Range 97 West\nSec 22: ALL')
        expected = 'T154N-R97W Section 14: NE/4\nT155N-R97W Sec 22: ALL'
        assert preprocess_plss(txt, ocr_scrub=True)[0] == expected

    def test_find_twprge(self):
        txt = ('Township 154 North, Range 97 West\nSection 14: NE/4\n'
               'T 155 N, R 97 W\nSection 22: ALL\n156N-97W\n'
               'Sec 1: Lots 1 - 3\nT1S-R9E')
        assert find_twprge(txt) == \
            ['T154N-R97W', 'T155N-R97W', 'T156N-R97W', 'T1S-R9E']

    def test_find_twprge_preprocess(self):
        txt = ('Township 154, Range 97 West\nSection 14: NE/4\n'
               'T 155 N, R 97\nSection 22: ALL\nT156-R97\n'
               'Sec 1: Lots 1 - 3\nT1S-R9E')
        assert find_twprge(txt, preprocess=True) == \
            ['T154N-R97W', 'T155N-R97W', 'T156N-R97W', 'T1S-R9E']
        assert find_twprge(txt, default_ns='s', default_ew='e',
                           preprocess=True) == \
            ['T154S-R97W', 'T155N-R97E', 'T156S-R97E', 'T1S-R9E']

    def test_no_pm(self):
        for txt in (
                'Township 154 North, Range 97 West, 5th PM, Sec 14: NE/4',
                'T154N-R97W, 5th PM, Sec 14: NE/4',
                '154N-97W, 5th PM, Sec 14: NE/4',
                'T154-R97, 5th PM, Sec 14: NE/4',
                '154N-R97, 5th PM, Sec 14: NE/4'):
            assert preprocess_plss(txt)[0] == 'T154N-R97W Sec 14: NE/4'
            assert preprocess_plss(txt, no_pm=True)[0] == \
                'T154N-R97W 5th PM, Sec 14: NE/4'


class TestBatchPreprocess:
    """The batched preprocessor must be indistinguishable from the
    scalar one (which the reference-differential suite gates), and the
    closed-form whitespace/cleanup rewrites must equal the reference's
    fixed-point loops."""

    FRAGS = ('T154N-R97W', 'Township 12 North, Range 8 West',
             '154n-97w', 'T7S R2E', 'Sec 14: NE/4', 'Sections 3 - 9: W/2',
             'of the 5th P.M.', 'T1N-R2', 'Twp 9 S, Rge 14 E',
             '...N½SW¼...', '\r\n', '  \t ', 'Lot 4(38.29)', 'T10½ junk',
             'R 60 W', 'Secion 7 - 9', 'principal meridian', 'T154-R97',
             '1 54N 97W', '')

    def test_batch_equals_scalar(self):
        import random
        from pytrs_spark.plss.document import (preprocess_plss,
                                               preprocess_plss_batch)
        rng = random.Random(11)
        mk = lambda: ' '.join(rng.choice(self.FRAGS)  # noqa: E731
                              for _ in range(rng.randint(0, 8)))
        for _ in range(12):
            batch = [mk() for _ in range(rng.randint(1, 30))]
            for ocr in (False, True):
                for nopm in (False, True):
                    got = preprocess_plss_batch(batch, 'n', 'w', ocr, nopm)
                    want = [preprocess_plss(t, 'n', 'w', ocr, nopm)
                            for t in batch]
                    assert got == want

    def test_batch_nul_fallback(self):
        from pytrs_spark.plss.document import (preprocess_plss,
                                               preprocess_plss_batch)
        batch = ['T154N-R97W Sec 14: NE/4', 'bad\x00doc T1S-R9E']
        got = preprocess_plss_batch(batch)
        assert got == [preprocess_plss(t) for t in batch]

    def test_reduce_whitespace_closed_form(self):
        import random
        import re
        from pytrs_spark.plss.document import cleanup_desc, \
            reduce_whitespace

        def rw_ref(text):
            text = text.strip()
            prev = None
            while text != prev:
                prev = text
                text = re.sub(r' +', ' ', text)
                text = re.sub(r'\t+', ' ', text)
                text = re.sub(r'\r', '\n', text)
                text = re.sub(r'\n{2,}', '\n\n', text)
                text = re.sub(r'^[ \t]', '', text)
            return text

        def cd_ref(text):
            words = (' the', ' all in', ' all of', ' of', ' in', ' and')
            prev = None
            while text != prev:
                prev = text
                text = text.lstrip('.')
                text = text.strip(',;:-–—\t\n ')
                for word in words:
                    if text.lower().endswith(word):
                        text = text[:-len(word)]
            return text

        rng = random.Random(3)
        chars = ' \t\r\n.,;:-–—abcOF IN THE ALL AND ofinandthe½¼'
        for _ in range(4000):
            s = ''.join(rng.choice(chars)
                        for _ in range(rng.randint(0, 40)))
            assert reduce_whitespace(s) == rw_ref(s), repr(s)
            assert cleanup_desc(s) == cd_ref(s), repr(s)


MULTI_LAYOUT_DESCS = (
    "T155N-R97W Sec 1: SW/4, T154N-R97W Sec 20: W/2, "
    "Sec 24 - 27: S/2, Sec 28: N/2",
    "Sec 1: SW/4 of T155N-R97W, Sec 20: W/2, Sec 24 - 27: S/2, "
    "Sec 28: N/2 of T154N-R97W",
    "SW/4 of Sec 1, T155N-R97W, W/2 of Sec 20, S/2 of Sec 24 - 27: "
    "N/2 of Sec 28, T154N-R97W",
    "T155N-R97W SW/4 of Sec 1, T154N-R97W W/2 of Sec 20, "
    "S/2 of Sec 24 - 27, N/2 of Sec 28",
)


class TestDocumentParse:
    @pytest.mark.parametrize("desc", MULTI_LAYOUT_DESCS)
    def test_multisec_all_layouts(self, desc):
        tracts = parse_document(desc)['tracts']
        assert tracts[0]['trs'] == '155n97w01'
        assert tracts[0]['desc'] == 'SW/4'
        assert tracts[1]['trs'] == '154n97w20'
        assert tracts[1]['desc'] == 'W/2'
        assert tracts[-1]['trs'] == '154n97w28'
        assert tracts[-1]['desc'] == 'N/2'
        mid = tracts[2:-1]
        assert [t['trs'] for t in mid] == \
            [f"154n97w{s:02d}" for s in range(24, 28)]
        assert all(t['desc'] == 'S/2' for t in mid)

    def test_default_nsew(self):
        def first_trs(txt, **kw):
            return parse_document(txt, **kw)['tracts'][0]['trs']
        assert first_trs("T154-R97W Sec 14: NE/4") == '154n97w14'
        assert first_trs("T154-R97W Sec 14: NE/4",
                         default_ns='s') == '154s97w14'
        assert first_trs("T154N-R97 Sec 14: NE/4") == '154n97w14'
        assert first_trs("T154N-R97 Sec 14: NE/4",
                         default_ew='e') == '154n97e14'
        assert first_trs("T154-R97 Sec 14: NE/4") == '154n97w14'
        assert first_trs("T154-R97 Sec 14: NE/4", default_ns='s',
                         default_ew='e') == '154s97e14'

    def test_desc_is_flawed(self):
        r = parse_document("Sec 22: W/2, T154N-R97W Sec 14: NE/4, "
                           "Sec 15: S/2")
        assert len(r['e_flags']) > 0
        r = parse_document("T154N-R97W Sec 14: NE/4, Sec 15: W/2")
        assert len(r['e_flags']) == 0

    def test_sec_within(self):
        txts = (
            'T154N-R97W: That part of the NE/4 of Sec 13 - 15 '
            'lying within RoW',
            'T154N-R97W\nThat part of the NE/4 of Sec 13 - 15 '
            'lying within RoW',
            'That part of the NE/4 of Sec 13 - 15, T154N-R97W '
            'lying within RoW',
            'That part of the NE/4 of Sec 13 - 15 lying within RoW, '
            'T154N-R97W',
        )
        expected_trs = ['154n97w13', '154n97w14', '154n97w15']
        for txt in txts:
            r = parse_document(txt, sec_within=True)
            assert [t['trs'] for t in r['tracts']] == expected_trs, txt
            for t in r['tracts']:
                assert t['desc'] == 'That part of the NE/4 lying within RoW'
            for trs in expected_trs:
                assert f"sec_within<{trs}>" in r['w_flags']

    def test_no_pm_parse(self):
        r = parse_document('T154N-R97W, 5th PM, Sec 14: NE/4')
        assert len(r['tracts']) == 1
        assert r['tracts'][0] == {'trs': '154n97w14', 'desc': 'NE/4',
                                  'sec_within': False}
        r = parse_document('T154N-R97W, 5th PM, Sec 14: NE/4', no_pm=True)
        assert len(r['tracts']) == 1
        assert r['tracts'][0]['trs'] == '154n97w14'
        assert r['tracts'][0]['desc'] == '5th PM'
        assert r['e_flags'] == ['unused_desc< NE/4>']

    def test_layout_deduction(self):
        assert deduce_layout('T154N-R97W Sec 14: NE/4') == 'TRS_desc'
        assert deduce_layout('NE/4 of Section 14, T154N-R97W') == 'desc_STR'
        assert deduce_layout('Section 14: NE/4, T154N-R97W') == 'S_desc_TR'
        assert deduce_layout('T154N-R97W some words here NE/4 of '
                             'Section 14') == 'TR_desc_S'
        assert deduce_layout('no plss here at all') == 'copy_all'


def test_parse_kernels_survive_fragment_fuzz():
    """A 10^12-row corpus contains garbage; the parse kernels must
    never raise on it.  Seeded fragment-fuzz (the same generator that
    found the reference's two crash/duplication bugs pinned in
    test_differential.py; the reference crashes on ~2% of these).

    Full sweep result (round 3, run out-of-band): 4,000 docs under
    the default config plus 1,500 docs under each of clean_qq /
    segment / require_colon / ocr_scrub / sec_within -- our rows
    equal the reference's on EVERY doc once its duplicate-row
    fallback bug is normalized (zero unexplained diffs, zero crashes
    ours; 94+36-97 crashes per config theirs)."""
    import random

    from pytrs_spark.plss.document import parse_document
    from pytrs_spark.plss.tract import parse_tract

    random.seed(20260817)
    frags = ['T154N-R97W', 'Sec 14', 'Sec', ':', 'NE/4', 'Lots 1 - 3',
             'ALL', 'T', 'R', 'N', 'W', '½', '¼', '5th P.M.', 'Township',
             'Range', 'Section', '-', ',', ';', 'of the', 'Lot 7(39.5)',
             '§', 'and', '  ', '\n', '01', '97', '154', 'S/2N/2', 'E2',
             'thru', '..', 'T0N-R0W', 'Sec 99', 'Lot 0', 'T9999N-R9999W',
             '(', ')', '1/2', '½¼¼¼', 'NENE', 'W2SW', 'L1', '\t', '\r\n',
             'Sections 1 - 36', 'T1S-R1E', 'part of', 'EXCEPT',
             '154n97w01']
    for _ in range(800):
        doc = ''.join(random.choice(frags) + random.choice([' ', '', ', '])
                      for _ in range(random.randint(1, 12)))
        r = parse_document(doc)                      # must not raise
        for t in r['tracts']:
            parse_tract(t['desc'])                   # must not raise


def test_flag_lines_are_always_pairs():
    """Every w/e flag-line the kernel emits must be a (flag, context)
    pair: the reference's own lists are shape-heterogeneous (bare
    strings at plss_parse.py:114, a (flag, flag) tuple pushed into
    FLAGS at :246), but our Arrow flag struct requires the uniform
    shape -- a bare string/tuple crashes serialization mid-stage."""
    from pytrs_spark.plss.document import parse_document
    docs = [
        # twprge_ignored path ('Section N of T...R...' false positive)
        ('T154N-R97W Sec 14: that part of the NE/4 lying within '
         'Section 22 of T155N-R98W', {}),
        # pulled_sec_without_colon path (cautious second pass)
        ('T154N-R97W Sec 14 NE/4',
         {'require_colon': 'sec_colon_cautious'}),
    ]
    for text, kw in docs:
        r = parse_document(text, **kw)
        for fl in r['w_flag_lines'] + r['e_flag_lines']:
            assert isinstance(fl, tuple) and len(fl) == 2, (text, fl)
            assert all(isinstance(x, str) for x in fl), (text, fl)
        for f in r['w_flags'] + r['e_flags']:
            assert isinstance(f, str), (text, f)


def test_preprocess_batch_none_fallback():
    """The NUL/None scalar fallback must survive None inputs (the
    guard that routes to it explicitly anticipates them)."""
    from pytrs_spark.plss.document import preprocess_plss_batch
    out = preprocess_plss_batch([None, 'T154N-R97W Sec 14: NE\x00'])
    assert len(out) == 2


def test_ocr_scrub_bracket_parity_with_reference():
    """']' inside a township number is NOT in the OCR map -- in the
    reference either (unpackers.py:508-513), so both engines emit the
    same (wrong-looking) truncated township.  Bug-for-bug parity is
    the contract; this pin keeps any one-sided 'fix' from landing."""
    import sys
    sys.path.insert(0, '/root/reference')
    from pytrs_spark.plss.document import parse_document
    r = parse_document('Township 1]4 North, Range 97 West, Sec 14: NE/4',
                       ocr_scrub=True)
    ours = [t['trs'] for t in r['tracts']]
    try:
        import pytrs
    except ImportError:
        assert ours == ['4n97w14']
        return
    d = pytrs.PLSSDesc('Township 1]4 North, Range 97 West, Sec 14: NE/4',
                       config='ocr_scrub', parse_qq=True)
    assert ours == [t.trs for t in d.tracts] == ['4n97w14']
