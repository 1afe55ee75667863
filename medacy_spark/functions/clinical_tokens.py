"""Reference clinical tokenizer rules (F4) as a pure-Python engine.

The reference tokenizes with a spaCy 2.2.2 ``Tokenizer`` configured by
``ClinicalTokenizer`` (clinical_tokenizer.py:34-59):

  * prefixes  = spaCy shared defaults + ``^[\\[\\("'\\\\/@]``
  * infixes   = spaCy shared defaults + ``\\[``, ``(?<=[0-9])-(?=[0-9])``,
                ``[!&:,()\\*/-><]``
  * suffixes  = REPLACED entirely by
                ``[\\]\\)"',.x\\-%\\?\\\\n]|\\*|(mg$)|(mcg$)|(mL$)|(cap$)|(-+$)$``
  * token_match = None, exceptions = spaCy English tokenizer_exceptions

This module re-implements the spaCy 2.x tokenizer ALGORITHM
(tokenizer.pyx: ``__call__`` whitespace scan → ``_split_affixes`` →
``_attach_tokens``) and compiles the same rule sets, so real clinical
text ("500mg", "10-20", "b.i.d.") splits the way the reference splits it.

Two behaviors of the reference's regexes look like bugs but are REAL and
replicated deliberately (same policy as the np.flip/boundary-repair
replays elsewhere in this repo):

  * the custom suffix class ``[\\]\\)"',.x\\-%\\?\\\\n]`` is UNANCHORED
    (every other alternative carries ``$``). spaCy's ``find_suffix`` takes
    ``match.end() - match.start()`` from a ``.search`` anywhere in the
    string and strips that many chars from the END — so any token
    containing ``n``, ``x``, ``.``, ``-`` … anywhere repeatedly loses its
    last character ("aspirin" → "aspiri", "n").
  * the custom infix class ``[!&:,()\\*/-><]`` contains ``/->`` which is a
    character RANGE U+002F..U+003E — all digits plus ``:;<=>`` — so every
    digit is an infix split point ("500" → "5", "0", "0").

spaCy defaults are reconstructed from the public spaCy 2.2 source
(spacy/lang/punctuation.py, char_classes.py), restricted to the
ASCII/Latin-1 + common-typography subset that occurs in clinical text;
the astral icon/CJK classes are not ported. Of the English
tokenizer_exceptions table, two subsets are ported and active by default
(DEFAULT_EXCEPTIONS): the identity abbreviations
(ENGLISH_ABBREV_EXCEPTIONS) and the contraction expansions
(ENGLISH_CONTRACTION_EXCEPTIONS — "don't" → ["do", "n't"] etc., built
programmatically the way spacy/lang/en/tokenizer_exceptions.py builds
them, including the apostrophe-less forms and the real-word exclusion
list). Emoticons and the long rare-word tail are not ported — pass your
own dict for those (``exceptions`` keeps spaCy's whole-string /
after-prefix / after-suffix lookup semantics).

Sentence segmentation: the reference's sentence boundaries come from
spaCy's dependency parser (base_pipeline.py:95-99), which cannot run
here. ``sentence_starts`` implements spaCy's rule-based Sentencizer
(spacy/pipeline/pipes.pyx, public) as the documented approximation: token
0 starts a sentence; after a sentence-final punct token ('!', '.', '?' —
the spaCy 2.2 Sentencizer defaults), the next NON-punct token starts a
new sentence (so runs of closing punctuation stay attached to the
sentence they end). Whitespace tokens count as tokens, exactly as they
do in a spaCy Doc.
"""

from __future__ import annotations

import re

# --- spaCy 2.2 shared default pieces (ASCII/common-typography subset) ---

_LIST_PUNCT = [
    "…", "……", ",", ":", ";", r"\!", r"\?", "¿", "¡",
    r"\(", r"\)", r"\[", r"\]", r"\{", r"\}", "<", ">", "_", "#", r"\*", "&",
]
_LIST_ELLIPSES = [r"\.\.+", "…"]
_LIST_QUOTES = [
    r"\'", '"', "”", "“", "`", "‘", "´", "’", "‚", ",", "„", "»", "«",
]
_LIST_CURRENCY = [r"\$", "£", "€", "¥", "฿"]
_HYPHENS = "-|–|—|--|---|——|~"  # merge_chars order: "-" wins over "--" (spaCy's own leftmost-alternation behavior)
_ALPHA = "A-Za-z"
_ALPHA_LOWER = "a-z"
_ALPHA_UPPER = "A-Z"

_SPACY_PREFIXES = (
    ["§", "%", "=", r"\+"]
    + _LIST_PUNCT
    + _LIST_ELLIPSES
    + _LIST_QUOTES
    + _LIST_CURRENCY
)
# clinical_tokenizer.py:40 — custom prefix appended to the defaults
_CUSTOM_PREFIXES = [r"""^[\[\("'\\/@]"""]

_SPACY_INFIXES = (
    _LIST_ELLIPSES
    + [
        r"(?<=[0-9])[+\-\*^](?=[0-9-])",
        rf"(?<=[{_ALPHA_LOWER}])\.(?=[{_ALPHA_UPPER}])",
        rf"(?<=[{_ALPHA}]),(?=[{_ALPHA}])",
        rf"(?<=[{_ALPHA}])(?:{_HYPHENS})(?=[{_ALPHA}])",
        rf"(?<=[{_ALPHA}])[:<>=](?=[{_ALPHA}])",
    ]
)
# clinical_tokenizer.py:48 — custom infixes appended, verbatim (incl. the
# accidental /-> range; see module docstring)
_CUSTOM_INFIXES = ['\\[', '(?<=[0-9])-(?=[0-9])', '[!&:,()\\*/-><]']

# spaCy English tokenizer_exceptions, the identity-abbreviation subset
# (spacy/lang/en/tokenizer_exceptions.py, public): chunks the tokenizer
# must keep whole instead of affix-stripping.
ENGLISH_ABBREV_EXCEPTIONS: dict[str, list[str]] = {
    orth: [orth]
    for orth in [
        "a.m.", "Adm.", "Bros.", "co.", "Co.", "Corp.", "D.C.", "Dr.",
        "e.g.", "E.g.", "E.G.", "Gen.", "Gov.", "i.e.", "I.e.", "I.E.",
        "Inc.", "Jr.", "Ltd.", "Md.", "Messrs.", "Mo.", "Mont.", "Mr.",
        "Mrs.", "Ms.", "p.m.", "Ph.D.", "Prof.", "Rep.", "Rev.", "Sen.",
        "St.", "vs.", "v.s.",
    ]
}


def _build_contractions() -> dict[str, list[str]]:
    """The contraction-expansion subset of spaCy's English
    tokenizer_exceptions table, built programmatically the way the public
    spacy/lang/en/tokenizer_exceptions.py builds it: every key's pieces
    concatenate back to the key (the ORTH invariant _attach_tokens relies
    on). Includes the apostrophe-less forms the real table defines ("dont"
    → ["do","nt"], "id" → ["i","d"] — yes, "id" really splits in spaCy)
    minus its real-word exclusion list."""
    exc: dict[str, list[str]] = {}

    def add(key: str, pieces: list[str]) -> None:
        assert "".join(pieces) == key
        exc[key] = pieces

    pron_m = ["i"]
    pron_lldve = ["i", "you", "he", "she", "it", "we", "they"]
    pron_ve = ["i", "you", "we", "they"]
    pron_re = ["you", "we", "they"]
    pron_s = ["he", "she", "it"]

    def forms(p: str) -> list[str]:
        return [p, p.title()]

    for p in pron_m:
        for o in forms(p):
            add(o + "'m", [o, "'m"])
            add(o + "m", [o, "m"])
            add(o + "'ma", [o, "'m", "a"])
            add(o + "ma", [o, "m", "a"])
    for p in pron_lldve:
        for o in forms(p):
            add(o + "'ll", [o, "'ll"])
            add(o + "ll", [o, "ll"])
            add(o + "'ll've", [o, "'ll", "'ve"])
            add(o + "llve", [o, "ll", "ve"])
            add(o + "'d", [o, "'d"])
            add(o + "d", [o, "d"])
            add(o + "'d've", [o, "'d", "'ve"])
            add(o + "dve", [o, "d", "ve"])
    for p in pron_ve:
        for o in forms(p):
            add(o + "'ve", [o, "'ve"])
            add(o + "ve", [o, "ve"])
    for p in pron_re:
        for o in forms(p):
            add(o + "'re", [o, "'re"])
            add(o + "re", [o, "re"])
    for p in pron_s:
        for o in forms(p):
            add(o + "'s", [o, "'s"])
            add(o + "s", [o, "s"])
    # W-words: possessive/copular clitics (who's, what'll, where'd, …)
    for w in ["who", "what", "when", "where", "why", "how", "there", "that"]:
        for o in forms(w):
            add(o + "'s", [o, "'s"])
            add(o + "s", [o, "s"])
            add(o + "'ll", [o, "'ll"])
            add(o + "ll", [o, "ll"])
            add(o + "'re", [o, "'re"])
            add(o + "re", [o, "re"])
            add(o + "'d", [o, "'d"])
            add(o + "d", [o, "d"])
            add(o + "'ve", [o, "'ve"])
            add(o + "ve", [o, "ve"])
    # verb + n't
    for v in ["ca", "could", "do", "does", "did", "had", "has", "have",
              "is", "are", "was", "were", "might", "must", "need", "ought",
              "sha", "should", "wo", "would", "ai", "dare"]:
        for o in forms(v):
            add(o + "n't", [o, "n't"])
            add(o + "nt", [o, "nt"])
            add(o + "n't've", [o, "n't", "'ve"])
            add(o + "ntve", [o, "nt", "ve"])
    # one-offs from the public table
    add("cannot", ["can", "not"])
    add("Cannot", ["Can", "not"])
    add("let's", ["let", "'s"])
    add("Let's", ["Let", "'s"])
    add("gonna", ["gon", "na"])
    add("Gonna", ["Gon", "na"])
    add("gotta", ["got", "ta"])
    add("Gotta", ["Got", "ta"])
    # spaCy's real-word exclusion list: these stay ordinary tokens
    for w in ["Ill", "ill", "Its", "its", "Hell", "hell", "Shell", "shell",
              "Shed", "shed", "Were", "were", "Well", "well",
              "Whore", "whore"]:
        exc.pop(w, None)
    return exc


ENGLISH_CONTRACTION_EXCEPTIONS: dict[str, list[str]] = _build_contractions()

# The default the reference effectively runs with (it loads spaCy's full
# English table): abbreviations + contractions.
DEFAULT_EXCEPTIONS: dict[str, list[str]] = {
    **ENGLISH_ABBREV_EXCEPTIONS,
    **ENGLISH_CONTRACTION_EXCEPTIONS,
}

# spaCy 2.2 Sentencizer default punct_chars (pipes.pyx)
SENT_PUNCT_CHARS = frozenset({"!", ".", "?"})


def sentence_starts(words: list[str]) -> list[bool]:
    """spaCy Sentencizer semantics over a token word sequence: token 0
    starts a sentence; after a punct token, the next non-punct token starts
    one (consecutive sentence-final puncts stay in the closing sentence)."""
    out = [False] * len(words)
    if not words:
        return out
    out[0] = True
    seen = False
    for i, w in enumerate(words):
        is_p = w in SENT_PUNCT_CHARS
        if seen and not is_p:
            out[i] = True
            seen = False
        elif is_p:
            seen = True
    return out

# compile_prefix_regex semantics: every piece ^-anchored, |-joined
PREFIX_RE = re.compile("|".join("^" + p for p in _SPACY_PREFIXES + _CUSTOM_PREFIXES))
# compile_infix_regex semantics: plain |-join
INFIX_RE = re.compile("|".join(_SPACY_INFIXES + _CUSTOM_INFIXES))
# clinical_tokenizer.py:58 — the suffix regex REPLACES spaCy's defaults, verbatim
SUFFIX_RE = re.compile(r'''[\]\)"',.x\-%\?\\n]|\*|(mg$)|(mcg$)|(mL$)|(cap$)|(-+$)$''')


class TokenizerRules:
    """A compiled spaCy-2.2 rule surface: the reference ships three
    tokenizers (clinical / systematic_review / character) that differ ONLY
    in these regexes (pipeline_components/tokenizers/*.py) — the algorithm
    is identical, so one engine serves all of them."""

    __slots__ = ("prefix_re", "infix_re", "suffix_re")

    def __init__(self, prefix_re: re.Pattern, infix_re: re.Pattern, suffix_re: re.Pattern):
        self.prefix_re = prefix_re
        self.infix_re = infix_re
        self.suffix_re = suffix_re


# clinical_tokenizer.py:34-59 (the default rule set of this module)
CLINICAL_RULES = TokenizerRules(PREFIX_RE, INFIX_RE, SUFFIX_RE)

# systematic_review_tokenizer.py:40,48,57 — same custom prefix; infix set
# uses the literal two-char '\[\]' (vs clinical's '\[') and keeps the
# /-> accidental range; the suffix regex is fully $-ANCHORED (this
# tokenizer does NOT have the clinical unanchored-suffix bug) and strips
# a trailing '.' instead of newline/x-anywhere.
SYSTEMATIC_REVIEW_RULES = TokenizerRules(
    PREFIX_RE,
    re.compile("|".join(_SPACY_INFIXES + [r"\[\]", r"(?<=[0-9])-(?=[0-9])", r"[!&:,()\*/-><]"])),
    re.compile(r'''[\]\)"',x\-%\?]$|(mg$)|(mcg$)|(mL$)|(cap$)|(\.$)'''),
)

# character_tokenizer.py:40,48,57 — '.' added to prefixes/infixes and as
# the whole suffix regex: every character strips, so tokens are single
# chars — EXCEPT whole-chunk exception matches ("Dr." stays one token),
# which the reference inherits from the shared exception table too.
CHARACTER_RULES = TokenizerRules(
    re.compile("|".join("^" + p for p in _SPACY_PREFIXES + ["."])),
    re.compile("|".join(_SPACY_INFIXES + ["."])),
    re.compile(r"."),
)


def _find_len(regex: re.Pattern, s: str) -> int:
    """spaCy find_prefix/find_suffix: length of the first .search match."""
    m = regex.search(s)
    return (m.end() - m.start()) if m is not None else 0


def _split_affixes(
    chunk: str, exceptions: dict[str, list[str]], rules: TokenizerRules
) -> tuple[list[tuple[int, int]], tuple[int, int], list[tuple[int, int]]]:
    """tokenizer.pyx _split_affixes over chunk-relative spans.

    Returns (prefix spans, middle span, suffix spans-in-strip-order).
    The suffix length is measured anywhere in the string but stripped
    from the END — reference behavior, see module docstring.
    """
    left, right = 0, len(chunk)
    prefixes: list[tuple[int, int]] = []
    suffixes: list[tuple[int, int]] = []
    last_size = -1
    while left < right and (right - left) != last_size:
        sub = chunk[left:right]
        if sub in exceptions:
            break
        last_size = len(sub)
        pre_len = _find_len(rules.prefix_re, sub)
        if pre_len:
            minus_pre = sub[pre_len:]
            if minus_pre and minus_pre in exceptions:
                prefixes.append((left, left + pre_len))
                left += pre_len
                break
        suf_len = _find_len(rules.suffix_re, sub)
        if suf_len:
            minus_suf = sub[: len(sub) - suf_len]
            if minus_suf and minus_suf in exceptions:
                suffixes.append((right - suf_len, right))
                right -= suf_len
                break
        if pre_len and suf_len and (pre_len + suf_len) <= len(sub):
            prefixes.append((left, left + pre_len))
            suffixes.append((right - suf_len, right))
            left += pre_len
            right -= suf_len
        elif pre_len:
            prefixes.append((left, left + pre_len))
            left += pre_len
        elif suf_len:
            suffixes.append((right - suf_len, right))
            right -= suf_len
        else:
            break
    return prefixes, (left, right), suffixes


def _attach_tokens(
    chunk: str,
    middle: tuple[int, int],
    exceptions: dict[str, list[str]],
    out: list[tuple[int, int]],
    rules: TokenizerRules,
) -> None:
    """tokenizer.pyx _attach_tokens: expand exceptions, else infix-split.

    A leading infix match (match.start() == 0) is skipped and absorbed
    into the first span — spaCy's start_before_infixes check.
    """
    lo, hi = middle
    if lo >= hi:
        return
    sub = chunk[lo:hi]
    if sub in exceptions:
        off = lo
        for piece in exceptions[sub]:
            out.append((off, off + len(piece)))
            off += len(piece)
        return
    matches = list(rules.infix_re.finditer(sub))
    if not matches:
        out.append((lo, hi))
        return
    start = 0
    for m in matches:
        i0, i1 = m.start(), m.end()
        if i0 == 0:
            continue
        if i0 != start:
            out.append((lo + start, lo + i0))
        if i0 != i1:
            out.append((lo + i0, lo + i1))
        start = i1
    if start < len(sub):
        out.append((lo + start, hi))


def _tokenize_chunk(
    text: str, lo: int, hi: int, exceptions: dict[str, list[str]],
    out: list[tuple[int, int]], rules: TokenizerRules,
) -> None:
    chunk = text[lo:hi]
    if chunk in exceptions:
        off = lo
        for piece in exceptions[chunk]:
            out.append((off, off + len(piece)))
            off += len(piece)
        return
    prefixes, middle, suffixes = _split_affixes(chunk, exceptions, rules)
    spans: list[tuple[int, int]] = []
    for s, e in prefixes:
        spans.append((s, e))
    mid_tokens: list[tuple[int, int]] = []
    _attach_tokens(chunk, middle, exceptions, mid_tokens, rules)
    spans.extend(mid_tokens)
    spans.extend(reversed(suffixes))
    out.extend((lo + s, lo + e) for s, e in spans)


def tokenize_with_offsets(
    text: str,
    exceptions: dict[str, list[str]] | None = None,
    rules: TokenizerRules | None = None,
) -> list[tuple[int, int, str]]:
    """Full document → [(idx, end_idx, word)] with the reference rules.

    Whitespace per spaCy Tokenizer.__call__: a single interior ' ' after a
    token is attached whitespace (no token); every other whitespace run —
    leading whitespace, newlines, runs of 2+ — becomes its own token.
    Every returned span satisfies text[idx:end_idx] == word, spans are
    ascending and non-overlapping, and every non-attached character is
    covered (EntTuple offset convention: start inclusive, end exclusive).

    ``exceptions`` defaults to DEFAULT_EXCEPTIONS (abbreviations +
    contraction expansions — the reference loads spaCy's full English
    special-case table); pass {} to disable.
    """
    if exceptions is None:
        exceptions = DEFAULT_EXCEPTIONS
    if rules is None:
        rules = CLINICAL_RULES
    spans: list[tuple[int, int]] = []
    n = len(text)
    if n == 0:
        return []
    start = 0
    in_ws = text[0].isspace()
    for i, uc in enumerate(text):
        if uc.isspace() != in_ws:
            if start < i:
                if in_ws:
                    # whitespace span: no rule in this rule set splits
                    # pure whitespace, so it is one token (as in spaCy)
                    spans.append((start, i))
                else:
                    _tokenize_chunk(text, start, i, exceptions, spans, rules)
            if uc == " ":
                start = i + 1
            else:
                start = i
            in_ws = not in_ws
    if start < n:
        if in_ws:
            spans.append((start, n))
        else:
            _tokenize_chunk(text, start, n, exceptions, spans, rules)
    return [(s, e, text[s:e]) for s, e in spans]
