"""Config-string codec (reference ``pytrs/parser/config/config.py``).

The reference parameterizes every parse with a comma-separated string,
e.g. ``'n,w,clean_qq,qq_depth.3'``; per-row config columns in bulk CSV
parsing carry the same syntax (``samples/csv_parser/parse_csv.py:29-
120``).  :func:`parse_config` maps such a string to the kwargs of the
fused parse kernel (document + tract parameters in one namespace, as
the reference's Config does -- ``config.py:217-235``).
"""

LAYOUTS = ('TRS_desc', 'desc_STR', 'S_desc_TR', 'TR_desc_S', 'copy_all')

_FLAGS = {
    'clean_qq': ('clean_qq', True),
    'suppress_lot_divs': ('suppress_lot_divs', True),
    'include_lot_divs': ('suppress_lot_divs', False),
    'require_colon': ('require_colon', True),
    'sec_colon_required': ('require_colon', True),
    'ocr_scrub': ('ocr_scrub', True),
    'segment': ('segment', True),
    'sec_within': ('sec_within', True),
    'no_pm': ('no_pm', True),
    'break_halves': ('break_halves', True),
}

_INTS = {'qq_depth', 'qq_depth_min', 'qq_depth_max'}

# Cautious two-pass colon mode (reference ``plssdesc.py:373-386``):
# require the colon on the first section pass; if nothing matched,
# rerun without.  Applies only when ``sec_colon_required`` is not
# set/True (``config.py:133-137``: required trumps cautious).  The
# kernel accepts this string as a ``require_colon`` value
# (``document.py::_find_sec_matches``).
SEC_COLON_CAUTIOUS = 'sec_colon_cautious'

# Reference-only knobs with no effect on the batch engine (parse
# always happens; nothing is deferred).
_IGNORED = {'wait_to_parse', 'parse_qq', 'init_parse_qq', 'init_parse'}


def parse_config(config: str) -> dict:
    """Config string -> kwargs for the fused parse kernel.  Unknown
    tokens are ignored (reference behavior: unrecognized config text
    is dropped silently)."""
    out = {}
    if not config:
        return out
    cautious = None
    for raw in str(config).split(','):
        token = raw.strip()
        if not token:
            continue
        if token == SEC_COLON_CAUTIOUS:
            cautious = True
        elif token in (SEC_COLON_CAUTIOUS + '.True',
                       SEC_COLON_CAUTIOUS + '.False'):
            cautious = token.endswith('.True')
        elif token in ('n', 's'):
            out['default_ns'] = token
        elif token in ('e', 'w'):
            out['default_ew'] = token
        elif token in LAYOUTS:
            out['layout'] = token
        elif token in _FLAGS:
            key, val = _FLAGS[token]
            out[key] = val
        elif '.' in token:
            key, _, val = token.partition('.')
            key = key.strip()
            if key in _INTS:
                try:
                    out[key] = int(val)
                except ValueError:
                    pass
            elif key == 'default_ns' and val in ('n', 's'):
                out['default_ns'] = val
            elif key == 'default_ew' and val in ('e', 'w'):
                out['default_ew'] = val
            elif key in _FLAGS and val in ('True', 'False'):
                out[_FLAGS[key][0]] = (val == 'True') is _FLAGS[key][1]
        elif token in _IGNORED:
            continue
    # Resolution order per the reference: required (True) beats
    # cautious regardless of token order in the string.
    if cautious and out.get('require_colon') is not True:
        out['require_colon'] = SEC_COLON_CAUTIOUS
    return out
