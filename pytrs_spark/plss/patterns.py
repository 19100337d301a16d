"""Regex library for PLSS legal-description parsing.

These patterns implement the same *language* accepted by the reference
implementation (JamesPImes/pyTRS v2.2.1, ``pytrs/parser/rgxlib/``), so
that parse outputs are row-for-row identical.  They are re-expressed
here in a consolidated module; every pattern cites the reference
pattern whose accepted language it reproduces.

All patterns run inside Arrow-batched pandas UDFs (Python ``re`` on
batch strings) -- the patterns use Python-only regex constructs
(variable-width lookbehinds via alternation of lookbehinds, nested
named groups) that Java regex cannot host, so the pandas-UDF route is
the correctness-safe route as well as the vectorized one.
"""

import re

# ---------------------------------------------------------------------
# Shared building blocks (cf. rgxlib/misc.py, rgxlib/aliquots.py)
# ---------------------------------------------------------------------

# Word "through" / thru / to / dash variants (misc.py:7-8).
THRU = r'([\-–—]|th[rough]{3,6}\.?|thru\.?|to)'
through_re = re.compile(THRU, re.IGNORECASE)

# Between elements of an elided list ("Lots 1 - 3, 5") (misc.py:14-28).
INTERVENER = (
    r"(?P<intervener>\s*(([\/\.,;:])|(?P<thru>" + THRU + r")|(?P<and>and|&))\s*)"
)

# Lookbehind: comma-ish or word boundary (misc.py:37).
COMMA_WB = r"((?<=[,;:])|(?<=\b))"

# Lookbehind requiring fraction char / digit / word boundary (aliquots.py:6).
FRAC_WB = r"((?<=¼|4|½|2)|(?<=\b))"

# Lookahead: next aliquot letter, separator, or end (aliquots.py:11).
AQ_AHEAD = r"((?=N|S|E|W)|(?=[\s,.;])|(?=$))"

# "Quarter" / "1/4" / "¼" (aliquots.py:14).
QUARTER_WORD = r"((One)?[\s\-]*Q[uarter]{3,7}|1\s*\/\s*4|¼)"
# "Half" / "1/2" / "½" (aliquots.py:17).
HALF_WORD = r"((One)?[\s\-]*Half|1\s*\/\s*2|½)"

# Quarter names without fraction (aliquots.py:22-25).
NE_W = r"(N\s{0,2}E|North?[\s\-]*East|N\.\s{0,2}E\.)"
SE_W = r"(S\s{0,2}E|South?[\s\-]*East|S\.\s{0,2}E\.)"
NW_W = r"(N\s{0,2}W|North?[\s\-]*West|N\.\s{0,2}W\.)"
SW_W = r"(S\s{0,2}W|South?[\s\-]*West|S\.\s{0,2}W\.)"

# Direction words for halves (aliquots.py:28-31).
N_W = r"(N\.?|No\.?|North?)"
S_W = r"(S\.?|So\.?|South?)"
E_W = r"(E\.?|East)"
W_W = r"(W\.?|West)"

# Short "/2" forms: 'N/2', 'N /2', 'N 2' etc. (aliquots.py:37-41).
_H = r"(({0}\/?2)|({0}\s{{1,2}}(2|\/\s{{0,2}}2)))"
N2_S, S2_S, E2_S, W2_S = (_H.format(d) for d in "NSEW")
# Short "/4" forms: 'NE/4', 'NE /4', 'NE 4' (aliquots.py:47-51).
_Q = r"(({0}\/?4)|({0}\s{{1,2}}(4|\/\s{{0,2}}4)))"
NE4_S, NW4_S, SE4_S, SW4_S = (_Q.format(q) for q in ("NE", "NW", "SE", "SW"))

# A cleaned-up aliquot component (aliquots.py:54).
AQ_CLEAN = r"(([NESW]½)|((NE|NW|SE|SW)¼))"


def _quarter_scrub_re(word, short):
    """Full quarter pattern: word-form + "Quarter", or short form."""
    return re.compile(
        FRAC_WB + r"((" + word + r"\s*" + QUARTER_WORD + r")|(" + short + r"))"
        + AQ_AHEAD,
        re.IGNORECASE)


def _half_scrub_re(word, short):
    """Full half pattern: word-form + "Half", or short form."""
    return re.compile(
        FRAC_WB + r"((" + word + r"\s*" + HALF_WORD + r")|(" + short + r"))"
        + AQ_AHEAD,
        re.IGNORECASE)


# Aliquot scrubber regexes (cf. aliquots.py:60-148).
ne_scrub = _quarter_scrub_re(NE_W, NE4_S)
se_scrub = _quarter_scrub_re(SE_W, SE4_S)
nw_scrub = _quarter_scrub_re(NW_W, NW4_S)
sw_scrub = _quarter_scrub_re(SW_W, SW4_S)
n2_scrub = _half_scrub_re(N_W, N2_S)
s2_scrub = _half_scrub_re(S_W, S2_S)
e2_scrub = _half_scrub_re(E_W, E2_S)
w2_scrub = _half_scrub_re(W_W, W2_S)

# clean_qq variants -- much broader (quarter word optional)
# (aliquots.py:154-164).
ne_loose = re.compile(NE_W + r"\s*(" + QUARTER_WORD + r")?", re.IGNORECASE)
se_loose = re.compile(SE_W + r"\s*(" + QUARTER_WORD + r")?", re.IGNORECASE)
nw_loose = re.compile(NW_W + r"\s*(" + QUARTER_WORD + r")?", re.IGNORECASE)
sw_loose = re.compile(SW_W + r"\s*(" + QUARTER_WORD + r")?", re.IGNORECASE)

# Standalone 'ALL' with up to 6 chars of trailing context (aliquots.py:173).
all_re = re.compile(r"\b(?P<all>ALL)(?P<context>.{1,6})?", re.IGNORECASE)

# 'E½NE' -> that trailing bare quarter should get its fraction
# (aliquots.py:180-220).
half_plus_q_re = re.compile(
    r"((?<=½)|(?<=\b))"
    r"(?P<half_aliquot>[NESW]½)"
    r"(\s*(?P<of_the>\s*of(\s*the)?)?\s*"
    r"(?P<q_rightmost>"
    r"(?P<ne_hit>" + NE_W + r")|(?P<nw_hit>" + NW_W + r")"
    r"|(?P<se_hit>" + SE_W + r")|(?P<sw_hit>" + SW_W + r")"
    r"))+"
    r"($|(?=[\s\.\,\;])|(?=[NESW]½)|(?=NE¼|NW¼|SE¼|SW¼))",
    re.IGNORECASE)

# 'N½ of the NE¼' -> strip the filler between components
# (aliquots.py:224-236).
intervener_strip_re = re.compile(
    r"(?P<aliquot1>(" + AQ_CLEAN + r")+)"
    r"(\s*(\s+|of|o|f|o+f+)\s*(t+h+e+|t+e+h+|t+h+|t+)?\s*)"
    r"(?P<aliquot2>" + AQ_CLEAN + r")",
    re.IGNORECASE)

# Split a preprocessed aliquot block into components (aliquots.py:242).
aq_component_re = re.compile(r"((?P<comp>[NESW]{1,2}|ALL)[½¼]?)")

# A whole preprocessed aliquot block (aliquots.py:245-246).
aq_block_re = re.compile(r"\b(([NESW]½)|((NE|NW|SE|SW)¼))+\b")

# ---------------------------------------------------------------------
# Lots (cf. rgxlib/lots.py)
# ---------------------------------------------------------------------

# Acreage "(39.21)" or "[39.21]" (lots.py:14-21).
ACREAGE = r"(\(\d{0,3}\.?\d{0,6}\)|\[\d{0,3}\.?\d{0,6}\])"

# Single lot (lots.py:23-35).
LOT = (
    COMMA_WB
    + r"((L\.?|Lt\.?|Lot)(?P<plural>s)?\s*(?P<lotnum>\d{1,3})\s*"
    + r"(?P<acreage>" + ACREAGE + r")?)"
)
lot_re = re.compile(LOT, re.IGNORECASE)

# Multi-lot "Lots 1 - 3, Lot 8(39.21)" (lots.py:39-62).
MULTILOT = (
    r"(" + LOT + r")"
    r"((" + INTERVENER + r")+"
    r"(?P<word_lot_rightmost>(L\.?|Lt\.?|Lot)(?P<plural_rightmost>s)?)?\s*"
    r"(?P<lotnum_rightmost>\d{1,3})\s*"
    r"(?P<acreage_notfirst>" + ACREAGE + r")?"
    r")*"
)
multilot_re = re.compile(MULTILOT, re.IGNORECASE)

# Multi-lot with optional leading aliquot "N½ of Lots 1 - 3"
# (lots.py:68-82).  Use only on preprocessed text.
multilot_with_aliquot_re = re.compile(
    COMMA_WB
    + r"((?P<aliquot>(([NESW]½)|((NE|NW|SE|SW)¼))+)\s*(of)?\s*)?"
    + r"(?P<lots>" + MULTILOT + r")",
    re.IGNORECASE)

# Extract acreage next to a lot number (lots.py:85-87).
lot_acres_re = re.compile(
    r"\d{1,3}\s*(?P<acreage>" + ACREAGE + r")", re.IGNORECASE)

# Rule out "Lots" at start of a no-NS-no-R twprge match (lots.py:11).
lots_context_re = re.compile(r"Lo?ts?|Lo?s?t", re.IGNORECASE)

# ---------------------------------------------------------------------
# Sections (cf. rgxlib/sec.py)
# ---------------------------------------------------------------------

# The word "Section" incl. common typos and '§' (sec.py:15-17).
SEC_WORD = r"(Section|Sect\.?|Sec\.?|Secion|Seciton|Secton|Sectn|Secn|§)"
sec_word_re = re.compile(SEC_WORD, re.IGNORECASE)

# "Section 14" (sec.py:20-33).
SEC = (
    r"(" + SEC_WORD + r"(?P<plural>s)?"
    r"[:\s*]?[\.\-–—\s]*"
    r"(?P<secnum>\d{1,3}))"
)
sec_re = re.compile(SEC, re.IGNORECASE)

# "Sections 3 - 9, and 12" + optional trailing colon (sec.py:36-54).
multisec_re = re.compile(
    r"(" + SEC + r")"
    r"((" + INTERVENER + r")+"
    r"(" + SEC_WORD + r"(?P<plural_rightmost>s)?)?\s*"
    r"(?P<secnum_rightmost>\d{1,3})"
    r")*"
    r"(?P<colon>\s*:)?",
    re.IGNORECASE)

# ---------------------------------------------------------------------
# Twp/Rge (cf. rgxlib/twprge.py)
# ---------------------------------------------------------------------

# The fully-specified Twp/Rge (twprge.py:12-49).  Note the "Range 2"
# edge case: bare rgenum '2' requires the word/letter "Range"/"R"
# beforehand, to avoid eating aliquots like "N2 W2".
TWPRGE = (
    COMMA_WB
    + r"((T[ownship]{0,9})[\.\-–—,\s]*)?"
    + r"(?P<twpnum>\d{1,3})"
    + r"[\.\-–—,\s]*"
    + r"(?P<ns>N[orth]{0,5}|S[outh]{0,5})"
    + r"[\.\-–—,;\|_~\s]*"
    + r"((((R[ange]{0,6})[\.\-–—,\s]*)?(?P<rgenum>\d{2,3}|[013-9]))"
    + r"|((R[ange]{0,6})[\.\-–—,\s]*(?P<rgenum_edgecase_rge2>2)))"
    + r"[\.\-–—,\s]*"
    + r"(?P<ew>W[est]{0,3}|E[ast]{0,3})"
)
twprge_re = re.compile(TWPRGE, re.IGNORECASE)

# "Township"-word with typo tolerance, 'T' required (twprge.py:73-82).
_TWP_WORD_T_REQ = (
    r"T("
    r"w\.?|"
    r"wp\.?|"
    r"o{0,2}w{0,2}n{0,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    r"w{1,2}o{1,2}n{1,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    r"o{1,2}w{1,2}n{1,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    r"o{1,2}w{1,2}s{1,2}n{1,2}h{1,2}i{0,2}p{0,2}|"
    r"o{1,2}w{1,2}n{1,2}h{1,2}s{1,2}i{0,2}p{0,2}|"
    r"o{1,2}w{1,2}n{1,2}s{1,2}i{0,2}h{1,2}p{0,2}"
    r")?"
)

# 'T' and 'R' required; N/S and E/W optional (twprge.py:68-96).
pp_twprge_no_nswe = re.compile(
    COMMA_WB + _TWP_WORD_T_REQ
    + r"[\.\-–—,\s]*(?P<twpnum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ns>N[orth]{0,5}|S[outh]{0,5})?"
    + r"[\.\-–—,;\|_~\s]+"
    + r"R([ange]{0,6})?[\.\-–—,\s]*(?P<rgenum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ew>W[est]{0,3}|E[ast]{0,3})?",
    re.IGNORECASE)

# 'T' and E/W required; 'R' and N/S optional (twprge.py:100-128).
pp_twprge_no_nsr = re.compile(
    COMMA_WB + _TWP_WORD_T_REQ
    + r"[\.\-–—,\s]*(?P<twpnum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ns>N[orth]{0,5}|S[outh]{0,5})?"
    + r"[\.\-–—,;\|_~\s]+"
    + r"(R[ange]{0,6})?[\.\-–—,\s]*(?P<rgenum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ew>W[est]{0,3}|E[ast]{0,3})",
    re.IGNORECASE)

# 'R' and N/S required; 'T' and E/W optional (twprge.py:132-161).
pp_twprge_no_ewt = re.compile(
    COMMA_WB
    + r"(T|Tw\.?|Twp\.?|"
    + r"To{0,2}w{0,2}n{0,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    + r"Tw{1,2}o{1,2}n{1,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    + r"To{1,2}w{1,2}n{1,2}s{1,2}h{1,2}i{0,2}p{0,2}|"
    + r"To{1,2}w{1,2}s{1,2}n{1,2}h{1,2}i{0,2}p{0,2}|"
    + r"To{1,2}w{1,2}n{1,2}h{1,2}s{1,2}i{0,2}p{0,2}|"
    + r"To{1,2}w{1,2}n{1,2}s{1,2}i{0,2}h{1,2}p{0,2}"
    + r")?"
    + r"[\.\-–—,\s]*(?P<twpnum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ns>N[orth]{0,5}|S[outh]{0,5})"
    + r"[\.\-–—,;\|_~\s]+"
    + r"R([ange]{0,6})?[\.\-–—,\s]*(?P<rgenum>\d{1,3})[\.\-–—,\s]*"
    + r"(?P<ew>W[est]{0,3}|E[ast]{0,3})?",
    re.IGNORECASE)

# OCR-artifact tolerant Twp/Rge (twprge.py:166-204).
pp_twprge_ocr_scrub = re.compile(
    COMMA_WB
    + r"T("
    + r"w\.?|"
    + r"wp\.?|"
    + r"[o0]{0,2}w{0,2}n{0,2}[s5]{1,2}h{1,2}[Il1]{0,2}p{0,2}|"
    + r"w{1,2}[o0]{1,2}n{1,2}s{1,2}h{1,2}[Il1]{0,2}p{0,2}|"
    + r"[o0]{1,2}w{1,2}n{1,2}s{1,2}h{1,2}[Il1]{0,2}p{0,2}|"
    + r"[o0]{1,2}w{1,2}s{1,2}n{1,2}h{1,2}[Il1]{0,2}p{0,2}|"
    + r"[o0]{1,2}w{1,2}n{1,2}h{1,2}s{1,2}[Il1]{0,2}p{0,2}|"
    + r"[o0]{1,2}w{1,2}n{1,2}s{1,2}[Il1]{0,2}h{1,2}p{0,2}"
    + r")?"
    + r"[\.\-–—,\s]*(?P<twpnum>[0-9SOIl\]\|]{1,3})[\.\-–—,\s]*"
    + r"(?P<ns>N[orth]{0,5}|S[outh]{0,5})"
    + r"[\.\-–—,;\|_~\s]*"
    + r"(R[ange]{0,6})?[\.\-–—,\s]*"
    + r"(?P<rgenum>[0-9SOIl\]\|]{2,3}|[013-9SOIl\]\|])"
    + r"[\.\-–—,\s]*(?P<ew>W[est]{0,3}|E[ast]{0,3})",
    re.IGNORECASE)

# "Principal Meridian" / "P.M." (twprge.py:212-223).
PM = (
    r"((P\.?\s{0,10}M\.?)"
    r"|(P{1,2}r{1,2}i{0,2}n{0,2}c{0,2}i{0,2}p{0,2}a{0,2}l{0,2}\s"
    r"{0,10}M{1,2}e{0,2}r{0,2}i{0,2}d{0,2}i{0,2}a{0,2}n{0,2}))"
)
pm_re = re.compile(PM, re.IGNORECASE)

# Twp/Rge followed (within ~25 chars) by a principal meridian
# (twprge.py:227-247).  Known super-linear hazard; see `no_pm`.
pp_twprge_pm = re.compile(
    TWPRGE
    + r"(\s*[:,;\.\-–—]*\s*)"
    + r"(o*f*)?\s*(t*h*e*|t*e*h*|h*t*e|h*e*t*)?\s*"
    + r"(.{0,25})"
    + r"(\s*[:,;\.\-–—]*)"
    + PM,
    re.IGNORECASE)

# Twp/Rge with trailing comma-ish chars to scrub (twprge.py:252-259).
pp_twprge_comma_remove = re.compile(
    TWPRGE + r"([\s:,;\.\-–—]*)", re.IGNORECASE)

# "Section 4 of T154N-R97W" false-positive context
# (context_checkers.py:8-29).
sec_twprge_in_between = re.compile(
    r"(" + SEC + r")"
    r"((" + INTERVENER + r")+"
    r"(" + SEC_WORD + r"(?P<plural_rightmost>s)?)?\s*"
    r"(?P<secnum_rightmost>\d{1,3})"
    r")*"
    r"(?P<colon>\s*:)?"
    r"\s*"
    r"(?P<between_found>in|of|,|all\s*of|all\s*(with)?in|lying\s*(with)?in"
    r"|that\s*lies\s*(with)?in)"
    r"\s*" + TWPRGE,
    re.IGNORECASE)

# ---------------------------------------------------------------------
# Warning-flag patterns (cf. rgxlib/warnings.py)
# ---------------------------------------------------------------------

well_re = re.compile(r'\b(wellbore|well)\b', re.IGNORECASE)
depth_re = re.compile(
    r'(depths?|surf(ace)?|\bdown\b|form(ation)?|\btop\b|\bbase\b)',
    re.IGNORECASE)
including_re = re.compile(r'\bincl', re.IGNORECASE)
less_except_re = re.compile(
    r'(\bless(\s*and\s*except)?|\bexcept|\blimit)', re.IGNORECASE)
isfa_re = re.compile(r'((but\s*)?only\s*)?(in\s*so\s*far)', re.IGNORECASE)
