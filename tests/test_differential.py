"""Differential oracle: run a varied corpus through BOTH the reference
library (imported read-only from /root/reference) and our pure-Python
kernels, and require row-for-row equality of (trs, desc, lots, qqs,
lot_acres) plus flag parity.

This is the north-star "matching pyTRS's own tract/aliquot parsing
unit tests row-for-row" check, generalized: instead of freezing a few
golden rows, every assertion is computed fresh from the reference at
test time.  Skipped cleanly if the reference tree is absent.
"""

import sys

import pytest

sys.path.insert(0, '/root/reference')
pytrs = pytest.importorskip('pytrs')

from pytrs_spark.plss import document as D  # noqa: E402
from pytrs_spark.plss import tract as Tr  # noqa: E402
from pytrs_spark.plss.simplify import simplify_aliquots  # noqa: E402

CORPUS = [
    "T154N-R97W Sec 14: NE/4",
    "T154N-R97W Sec 14: NE/4, Sec 15 - 17: ALL, Sec 1: Lots 1 - 3, S/2N/2",
    "Township 155 North, Range 97 West Sec 1: Lots 1(38.29), 2(39.22), "
    "S2N2",
    "Sec 14 of T154N-R97W: N/2 of the NE/4 of SW/4",
    "ALL of Sec 4 - 6, E/2, W/2 of Sec 7, T10S-R5E",
    "T154N-R97W Sec 25: W½SE¼, E½SW¼, including a road easement",
    "154n97w: NW/4 of Sec 1",
    "T154N-R97W Sec 3 - 5, 7: S/2",
    "Sec 9 - 3: NE/4, T154N-R97W",                   # reversed range
    "T1S-R7E Sec 36: Lot 8(39.21), N/2 of Lot 2, SE/4SE/4",
    "T154N-R97W Sec 14: NENE, NWNE",                 # clean_qq shapes
    "T154N-R97W Sec 14: S2NENW",
    "T154N-R97W Sec 01: E½NE",                       # half+quarter infer
    "Lots 1 - 3, Sec 1, T154N-R97W",
    "T154N-R97W Sec 14: ALL",
    "T154N-R97W, 5th P.M., Sec 14: SW/4",            # PM scrubber
    "T154N-R97W Sec 14: NE/4, T153N-R98W Sec 22: W/2",  # 2 twprge
    "Section 4: N2 of T7N-R2W",
    "W/2 of Sec 30, T154N-R97W",
    "T154N-R97W Sec 14: N/2 less and except the E/2NE/4",
    "T15oN-R97W Sec 14: NE/4",                       # OCR 'o' for 0
    # round-3 additions: lot/aliquot interleavings, wordy sections,
    # conjunction ranges, stacked PM noise, deep nesting
    "T154N-R97W Sec 14: Lots 1, 2, E/2 of Lot 3",
    "T154N-R97W Sec 14: NE/4 of Lot 5",
    "T154N-R97W Sections 3 and 4: ALL",
    "T154N-R97W Secs 1, 3, 5: S/2",
    "Section 14, Township 154 North, Range 97 West: NE/4",
    "T154N-R97W Sec 14: SE/4NE/4NW/4",               # depth-3 aliquot
    "T154N-R97W Sec 14: N/2 of the S/2 of the NE/4",
    "T2N-R3W, Fifth Principal Meridian, Sec 20: W/2",
    "T154N-R97W Sec 14: Lot 1(40.00), Lot 2 (39.5), SW NE",
    "That part of the NE/4 of Sec 14, T154N-R97W lying north of the "
    "railroad",
    "T154N-R97W Sec 14: NE/4; Sec 22: SW/4",         # semicolon split
    "T7S-R12E Sec 31: Lots 1 - 4, E/2W/2",           # fractional sec
    # round-3 additions II: lot-of-aliquot, stacked PMs, dotted
    # abbreviations, aliquot-of-lots, interest language, exceptions,
    # conjunction multi-ranges, leading-aliquot multi-sec, acreage
    # lists, section sign, hyphenated twprge, out-of-range secs,
    # depth-4 chains (all verified to agree with the reference under
    # default/clean_qq/segment/require_colon before inclusion)
    "T154N-R97W Sec 14: Lot 1 of the NE/4",
    "T154N-R97W, 5th P.M., T153N-R98W, 6th P.M., Sec 1: ALL",
    "Twp. 154 N., Rge. 97 W., Sec. 14: N.E.1/4",
    "T154N-R97W Sec 14: E2 of Lots 1 - 4",
    "T154N-R97W Sec 14: undivided 1/2 interest in the NE/4",
    "T154N-R97W Sec 14: NE/4, EXCEPT Lot 7",
    "T154N-R97W Secs 1 - 3 and 5 - 7: S/2",
    "S2 of Sec 14 and N2 of Sec 23, T154N-R97W",
    "T154N-R97W Sec 14: Lots 1 - 3 (39.25, 40.10, 38.00)",
    "T154N-R97W §14: NE/4",
    "T-154-N R-97-W Sec 14: SE/4",
    "T154N-R97W Sec 00: NE/4",
    "T154N-R97W Sec 37: NE/4",
    "T7N-R2W Sec 20: W/2 of the E/2 of the NW/4 of the SE/4",
    # round-4 additions: colon-mode divergence docs.  The first parses
    # under default and sec_colon_cautious (second pass) but not under
    # sec_colon_required; the second keeps Sec 22 only when colons are
    # not required at all (cautious pass 1 already matched Sec 14, so
    # no second pass runs) -- three distinct outcomes per doc.
    "T154N-R97W Sec 14 NE/4",
    "T154N-R97W Sec 14: NE/4, Sec 22 SW/4",
]

CONFIGS = [
    {},
    {'clean_qq': True},
    {'qq_depth': 1},
    {'qq_depth_min': 3},
    {'qq_depth_max': 1},
    {'break_halves': True},
    {'suppress_lot_divs': True},
    {'default_ns': 's', 'default_ew': 'e'},
    {'segment': True},
    {'require_colon': True},
    # Cautious two-pass colon mode (reference plssdesc.py:373-386):
    # must diverge from BOTH require_colon=True and the default on the
    # colonless-section corpus rows below.  The forced-TRS_desc pair
    # pins the divergence where it matters: with layout forced, the
    # colonless doc 'T154N-R97W Sec 14 NE/4' parses under cautious
    # (second pass) but not under required (the reference crashes
    # there -- plss_parse.py:825 -- which the harness treats as
    # "must not crash" for our kernel).
    {'require_colon': 'sec_colon_cautious'},
    {'layout': 'TRS_desc', 'require_colon': 'sec_colon_cautious'},
    {'layout': 'TRS_desc', 'require_colon': True},
    {'sec_within': True},
    {'ocr_scrub': True},
    {'no_pm': True},
]

_DOC_KW = ('layout', 'default_ns', 'default_ew', 'ocr_scrub',
           'require_colon', 'segment', 'sec_within', 'no_pm')


def _cfg_string(kw):
    parts = []
    for k, v in kw.items():
        if k in ('default_ns', 'default_ew'):
            parts.append(v)
        elif k == 'layout':
            parts.append(v)
        elif k == 'require_colon':
            parts.append('sec_colon_cautious'
                         if v == 'sec_colon_cautious'
                         else 'sec_colon_required')
        elif v is True:
            parts.append(k)
        else:
            parts.append(f'{k}.{v}')
    parts.append('parse_qq')
    return ','.join(parts)


def _ours(text, kw):
    doc_kw = {k: kw[k] for k in _DOC_KW if k in kw}
    tract_kw = {k: kw[k] for k in
                ('clean_qq', 'suppress_lot_divs', 'qq_depth',
                 'qq_depth_min', 'qq_depth_max', 'break_halves')
                if k in kw}
    r = D.parse_document(text, **doc_kw)
    rows = []
    for t in r['tracts']:
        tp = Tr.parse_tract(t['desc'], **tract_kw)
        rows.append((t['trs'], t['desc'], tp['lots'], tp['qqs'],
                     tp['lot_acres']))
    return rows, r


def _reference(text, kw):
    # Reference quirk (plssdesc.py:361): ``self.layout = layout``
    # runs AFTER the config setter, so a layout in the config string
    # (and even the ``layout=`` init kwarg) is inert for the
    # init-time parse -- only an explicit ``.parse(layout=...)`` call
    # mandates a layout.  Our engine honors the DOCUMENTED semantics
    # (config layout == mandate), so compare like-for-like by calling
    # ``.parse(layout=...)`` explicitly.
    if 'layout' in kw:
        rest = {k: v for k, v in kw.items() if k != 'layout'}
        ref = pytrs.PLSSDesc(text, config=_cfg_string(rest))
        ref.parse(layout=kw['layout'], commit=True)
    else:
        ref = pytrs.PLSSDesc(text, config=_cfg_string(kw))
    rows = [(t.trs, t.desc, t.lots, t.qqs, t.lot_acres)
            for t in ref.tracts]
    return rows, ref


@pytest.mark.parametrize('kw', CONFIGS,
                         ids=[_cfg_string(c) for c in CONFIGS])
def test_corpus_row_for_row(kw):
    diffs = []
    for text in CORPUS:
        try:
            theirs, _ = _reference(text, kw)
        except TypeError:
            # The reference crashes on some inputs (e.g. unused
            # never-staged sec under sec_colon_required,
            # plss_parse.py:825).  Our kernel must not crash; nothing
            # to compare beyond that.
            _ours(text, kw)
            continue
        ours, _ = _ours(text, kw)
        if ours != theirs:
            diffs.append((text, theirs, ours))
    assert not diffs, '\n'.join(
        f'{t!r}\n  ref : {r}\n  mine: {m}' for t, r, m in diffs)


def test_flags_match_reference():
    for text in CORPUS:
        _, mine = _ours(text, {})
        _, ref = _reference(text, {})
        assert sorted(mine['w_flags']) == sorted(ref.w_flags), text
        assert sorted(mine['e_flags']) == sorted(ref.e_flags), text
        # ref.layout is populated only when configured explicitly; the
        # deduced layout isn't exposed, so compare only when present.
        if ref.layout is not None:
            assert mine['layout'] == ref.layout, text


def _random_corpus(n=250, seed=42):
    """Seeded generator of structurally varied descriptions built from
    the grammar's building blocks (layouts x aliquots x lots x ranges)."""
    import random
    rng = random.Random(seed)
    aliquots = ['NE/4', 'W/2', 'S/2N/2', 'SE/4SW/4', 'N/2 of the NE/4',
                'E½NW¼', 'ALL', 'NENE', 'S2NENW', 'W½SE¼']
    lot_bits = ['Lot 1', 'Lots 1 - 3', 'Lot 8(39.21)',
                'Lots 4(21.7), 5(22.3)', 'N/2 of Lot 2']
    out = []
    for _ in range(n):
        twp = rng.randint(1, 199)
        rge = rng.randint(1, 99)
        ns = rng.choice('NS')
        ew = rng.choice('EW')
        tr_style = rng.choice([
            f'T{twp}{ns}-R{rge}{ew}',
            f'Township {twp} {"North" if ns == "N" else "South"}, '
            f'Range {rge} {"East" if ew == "E" else "West"}',
            f'{twp}{ns.lower()}{rge}{ew.lower()}',
        ])
        n_secs = rng.randint(1, 3)
        parts = []
        for _ in range(n_secs):
            s = rng.randint(1, 36)
            if rng.random() < 0.25:
                sec = f'Sec {s} - {min(36, s + rng.randint(1, 3))}'
            else:
                sec = f'Sec {s}'
            body = ', '.join(
                rng.sample(aliquots, rng.randint(1, 2))
                + (rng.sample(lot_bits, 1) if rng.random() < 0.3 else []))
            parts.append((sec, body))
        layout_roll = rng.random()
        if layout_roll < 0.6:   # TRS_desc
            doc = tr_style + ' ' + ', '.join(
                f'{sec}: {body}' for sec, body in parts)
        elif layout_roll < 0.8:  # desc_STR
            doc = ', '.join(f'{body} of {sec}' for sec, body in parts) \
                + ', ' + tr_style
        else:                    # TR_desc_S
            doc = tr_style + ' ' + ', '.join(
                f'{body} of {sec}' for sec, body in parts)
        # Real-document noise: PM phrases, exception clauses, ragged
        # whitespace/newlines -- each must parse identically to the
        # reference (flags included, compared separately).
        if rng.random() < 0.15:
            doc = doc.replace(' Sec', ', 5th P.M., Sec', 1)
        if rng.random() < 0.15:
            doc += rng.choice(
                [', less and except the W/2NW/4',
                 ', including a road easement',
                 ', subject to an easement of record'])
        if rng.random() < 0.2:
            doc = doc.replace(', ', ',\n ', 1).replace(' Sec', '  Sec')
        out.append(doc)
    return out


@pytest.mark.parametrize('kw', [{}, {'clean_qq': True}, {'qq_depth': 2},
                                {'break_halves': True}, {'segment': True},
                                {'sec_within': True},
                                {'require_colon': True},
                                {'suppress_lot_divs': True},
                                {'ocr_scrub': True, 'clean_qq': True}],
                         ids=['default', 'clean_qq', 'qq_depth2',
                              'break_halves', 'segment', 'sec_within',
                              'require_colon', 'suppress_lot_divs',
                              'ocr_clean'])
def test_randomized_corpus_row_for_row(kw):
    diffs = []
    for text in _random_corpus():
        try:
            theirs, _ = _reference(text, kw)
        except TypeError:
            _ours(text, kw)
            continue
        ours, _ = _ours(text, kw)
        if ours != theirs:
            diffs.append((text, theirs, ours))
    assert not diffs, f'{len(diffs)} diffs; first 3:\n' + '\n'.join(
        f'{t!r}\n  ref : {r}\n  mine: {m}' for t, r, m in diffs[:3])


def test_simplify_matches_reference_aliquots():
    """A6: our quadtree consolidation == the reference's on every
    corpus tract's qqs (both orderings and 'ALL' rendering)."""
    from pytrs.parser.tract.aliquot_simplify import (
        simplify_aliquots as ref_simplify,
    )
    for text in CORPUS:
        for _, _, _, qqs, _ in _ours(text, {})[0]:
            for std in (False, True):
                assert simplify_aliquots(qqs, std) \
                    == ref_simplify(qqs, assume_standard=std), (text, qqs)


def test_flag_handdown_order():
    """Order-sensitive flag parity: the tract's own flags come FIRST,
    handed-down document flags AFTER (plss_parse.py:475-485
    ``tract.w_flags.extend(self.w_flags)``)."""
    checked = 0
    for text in CORPUS:
        try:
            ref = pytrs.PLSSDesc(text, config='parse_qq')
        except TypeError:
            continue
        doc = D.parse_document(text)
        for t, rt in zip(doc['tracts'], ref.tracts):
            tp = Tr.parse_tract(t['desc'])
            combined = list(tp['w_flags']) + list(doc['w_flags'])
            assert combined == list(rt.w_flags), (text, t['desc'])
            if combined:
                checked += 1
    assert checked > 0   # the corpus must actually exercise flags


_TRS_COMPONENTS = [
    154, '154', '154n', '154s', '154N', 0, '0', '007', 1234, '1234',
    -5, '-5', '-5n', 'asdf', 'asdfn', '154nn', '15x4n', '', None,
    '97w', '97e', 97, '97', '1e',
]
_SEC_COMPONENTS = [5, '5', '05', 0, '0', 36, '36', 123, '123', -1,
                   '-1', 'xx', '', None, '5a']


def test_construct_trs_matches_reference(spark):
    """Native compose_trs == reference TRS.construct_trs over the
    component edge cases (error sentinels, embedded directions,
    int-normalization quirks)."""
    from pyspark.sql import functions as F
    from pytrs_spark.operators.parse import compose_trs

    cases = []
    for i, twp in enumerate(_TRS_COMPONENTS):
        for j, sec in enumerate(_SEC_COMPONENTS):
            rge = _TRS_COMPONENTS[(i * 7 + j) % len(_TRS_COMPONENTS)]
            cases.append((len(cases), twp, rge, sec))
    expected = [pytrs.TRS.construct_trs(t, r, s) for _, t, r, s in cases]

    df = spark.createDataFrame(
        [(i, str(t) if t is not None else None,
          str(r) if r is not None else None,
          str(s) if s is not None else None)
         for i, t, r, s in cases],
        'id long, twp string, rge string, sec string')
    got = {r['id']: r['trs'] for r in df.select(
        'id', compose_trs('twp', 'rge', 'sec').alias('trs')).collect()}

    diffs = []
    for (i, t, r, s), exp in zip(cases, expected):
        # Our column test casts everything through strings; the
        # reference treats int and its str form identically except for
        # negative ints (int path skips direction-strip), which agree
        # anyway.
        if got[i] != exp:
            diffs.append((t, r, s, exp, got[i]))
    assert not diffs, diffs[:10]


def test_sinks_match_reference(spark):
    """S5 driver-side sinks: tracts_to_dict/list/str and pretty_desc
    byte-identical to the reference on a multi-twprge corpus."""
    from pytrs_spark.operators import query as Q
    from pytrs_spark.operators.parse import parse_documents

    text = ('T154N-R97W Sec 14: NE/4, Sec 1: S2N2, '
            'T153N-R98W Sec 36: ALL, Sec 22: W/2')
    ref = pytrs.PLSSDesc(text, config='parse_qq')
    tl = pytrs.TractList(ref)

    docs = spark.createDataFrame([(0, text)],
                                 'doc_id long, raw_desc string')
    tracts = parse_documents(docs, text_col='raw_desc', decompose=True)
    from pytrs_spark.operators.parse import parse_tract_details
    full = parse_tract_details(tracts)

    attrs = ['trs', 'desc', 'qqs']
    assert Q.tracts_to_dict(full, attrs) \
        == tl.tracts_to_dict('trs', 'desc', 'qqs')
    assert Q.tracts_to_list(full, attrs) \
        == tl.tracts_to_list('trs', 'desc', 'qqs')
    assert Q.tracts_to_str(full, attrs) \
        == tl.tracts_to_str('trs', 'desc', 'qqs')
    assert Q.pretty_desc(tracts) == tl.pretty_desc()
    assert Q.pretty_desc(tracts, word_sec='Section ') \
        == tl.pretty_desc(word_sec='Section ')

    # quick_desc_short: default cap, custom cap, and a cap short
    # enough to truncate every line.
    for max_len in (30, 18, 12):
        mine = '\n'.join(
            r['quick_desc'] for r in
            Q.quick_desc_short(tracts, max_len=max_len).collect())
        assert mine == tl.quick_desc_short(max_len=max_len), max_len

    # pretty_desc(justify_linebreaks=...): only linebreaks WITHIN a
    # tract desc re-justify.  Parse preprocessing flattens newlines,
    # so build tracts with embedded '\n' directly on both sides.
    ref_tracts = pytrs.TractList(
        [pytrs.Tract('NE/4 less\nthe well pad', '154n97w14'),
         pytrs.Tract('Lots 1 - 3,\nS/2N/2', '154n97w01'),
         pytrs.Tract('ALL', '153n98w36')])
    rows = [(i, t.trs, t.desc, t.twprge, 154 if i < 2 else 153,
             'n', 97 if i < 2 else 98, 'w', int(t.sec))
            for i, t in enumerate(ref_tracts)]
    manual = spark.createDataFrame(
        rows, 'orig_index long, trs string, desc string, '
              'twprge string, twp_num int, twp_ns string, '
              'rge_num int, rge_ew string, sec_num int')
    for jst in (None, '', '\t', '  '):
        assert Q.pretty_desc(manual, justify_linebreaks=jst) \
            == ref_tracts.pretty_desc(justify_linebreaks=jst), repr(jst)


def test_forced_layout_reference_semantics():
    """Forced (user-dictated) layout -- bug-exact parity (round 4).

    Measured reference behavior (v2.2.1):

    1. A layout given at construction -- ``PLSSDesc(txt,
       layout=...)`` or ``config='<layout>'`` -- is silently
       DISCARDED: ``plssdesc.py:361`` stores it AFTER the config
       setter, and the auto-parse calls ``.parse()`` whose ``layout``
       parameter defaults to ``None`` and is passed through to
       ``PLSSParser`` without consulting ``self.layout``
       (``plssdesc.py:736-741``), so the parser deduces per usual.
       That is an init-order accident with no usable semantics, so
       our engine maps a forced layout (config token or kwarg) to the
       reference's one WORKING mandate path instead:
    2. An explicit ``.parse(layout=...)`` call mandates
       (``plss_parse.py:354``), which means: the chunk layout stays
       ``None`` (``plss_parse.py:796-798``), each finder re-deduces
       for itself (``plss_parse.py:67,179``), and the marker walk
       runs layout-agnostic (``None`` fails every membership test in
       ``_parse_meaningful``, so both working lists are pre-staged
       and pairing is desc->sec).  Our ``layout=`` kwarg reproduces
       that walk exactly -- including the ``twprge_error`` rows it
       emits on well-formed sec-first text and the doubled rows of
       the copy_all fallback.
    3. Mandated ``copy_all`` short-circuits the walk and works.

    Parity here is corpus x all five layouts against the explicit
    ``.parse(layout=...)`` path.
    """
    text = 'T154N-R97W Sec 14: NE/4'
    deduced = [('154n97w14', 'NE/4')]

    # (1) constructor layout is ignored by the reference.
    for via in (dict(layout='copy_all'), dict(config='copy_all')):
        ref = pytrs.PLSSDesc(text, **via)
        assert [(t.trs, t.desc) for t in ref.tracts] == deduced

    # (2)+(3) every mandated layout: reference .parse(layout=...) ==
    # ours, row-for-row, on the whole corpus.
    for layout in ('TRS_desc', 'desc_STR', 'S_desc_TR', 'TR_desc_S',
                   'copy_all'):
        for t in CORPUS:
            ref = pytrs.PLSSDesc(t, config='wait_to_parse')
            try:
                ref.parse(layout=layout, commit=True, parse_qq=True)
            except TypeError:
                # Reference crash (plss_parse.py:825); ours must not.
                _ours(t, {'layout': layout})
                continue
            theirs = [(x.trs, x.desc, x.lots, x.qqs, x.lot_acres)
                      for x in ref.tracts]
            mine, _ = _ours(t, {'layout': layout})
            assert mine == theirs, (layout, t)


def test_reference_unused_sec_crash_is_handled():
    """Reference CRASH pin: under ``sec_colon_required``, text whose
    section never gets a colon ('T154N-R97W Sec 14 NE/4') kills the
    reference with ``TypeError: can only join an iterable`` at
    ``plss_parse.py:825`` (the ``unused_sec<...>`` flag formatter
    joins a non-iterable working sec).  A parser that dies on one
    malformed row cannot run over a 10^12-row corpus; our engine
    parses the document via the copy_all fallback instead and returns
    a row.  Pinned so we notice if a reference upgrade fixes the crash
    (then flag parity should be revisited)."""
    text = 'T154N-R97W Sec 14 NE/4'
    with pytest.raises(TypeError):
        pytrs.PLSSDesc(text, config='sec_colon_required,parse_qq')
    ours, _ = _ours(text, {'require_colon': True})
    # Two identical rows: the copy_all fallback's double-handoff
    # quirk (reproduced for parity, see
    # test_reference_fallback_duplicate_rows_replicated) applies on
    # this path too -- the reference crashes before reaching it.
    assert len(ours) == 2
    assert ours[0] == ours[1]
    assert ours[0][0] == '154n97w14'


def test_reference_fallback_duplicate_rows_replicated():
    """Reference QUIRK pin #2, now reproduced bug-for-bug (round 4):
    when a walk layout stages ZERO tracts, the reference's copy_all
    fallback (``plss_parse.py:835-846``) registers the replacement
    chunk's components twice -- the replacement ``ChunkParser`` hands
    them to the parent during its own ``__init__``
    (``plss_parse.py:779-787``), then the original chunk copies the
    same staged lists over and hands them off again -- so every such
    document yields its tract row (and staged chunk flags) exactly
    twice.  The bare ``twprge_error`` flag is NOT doubled: it comes
    from the parent-level ``check_error_tracts`` post-pass, not the
    chunk handoff.  Found by fragment-fuzzing 4,000 garbage documents
    (reference: 94 crashes + this; our engine: zero crashes).  We
    reproduce the duplication for row-for-row parity (a reference
    user switching engines sees identical rows; the dedup operators
    remove them on request)."""
    doc = 'W½ 01 Section T154N-R97W'
    ref = pytrs.PLSSDesc(doc, config='parse_qq')
    rows = [(t.trs, t.desc) for t in ref.tracts]
    assert rows == [('154n97wXX', doc)] * 2          # the reference quirk
    assert ref.e_flags == ['twprge_error']           # post-pass: once
    ours, r = _ours(doc, {})
    assert [(t[0], t[1]) for t in ours] == [('154n97wXX', doc)] * 2
    assert r['e_flags'] == ['twprge_error']
