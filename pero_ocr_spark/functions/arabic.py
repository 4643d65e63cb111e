"""Arabic contextual shaping + visual/label reordering (R18).

The reference's ``core/arabic_helper.py`` (backed by the
arabic_reshaper package) converts between three text forms:

  * string       — logical order, base letters;
  * label form   — logical chars, VISUAL order (the OCR training
    target: the net reads glyphs left-to-right);
  * visual form  — presentation-form glyphs in visual order (what a
    renderer would draw).

This module reimplements that API with the shaping tables as DATA:
``FORMS`` maps each base letter to its (isolated, final, initial,
medial) Unicode Presentation Forms-B code points — public Unicode
data, same contract as the reference's ``forward_mapping``
(arabic_helper.py:22-100) — plus the four lam-alef ligatures
(arabic_helper.py:102). Contextual form selection is the standard
joining algorithm: a letter takes INITIAL/MEDIAL only when it can
join forward (has those forms) and the next letter joins backward.

Scope: the core Arabic block (U+0621–U+064A + tatweel). Extended
Persian/Urdu letters are additional table rows, not new code.

Reordering (``_reverse``) follows the reference's semantics
(arabic_helper.py:247-321): split the line into Arabic and non-Arabic
sequences (delimiters bind to the current sequence; an Arabic
sequence's trailing delimiters migrate to the next Arabic sequence),
reverse the chars of Arabic sequences, then reverse the sequence
order — i.e. the LINE flips RTL while embedded LTR spans keep their
internal order.
"""

from __future__ import annotations

# base letter -> (isolated, final, initial, medial); 0 = form absent.
# Unicode Arabic Presentation Forms-B (U+FE70..U+FEFF).
_F = {
    0x0621: (0xFE80, 0, 0, 0),        # hamza
    0x0622: (0xFE81, 0xFE82, 0, 0),   # alef madda
    0x0623: (0xFE83, 0xFE84, 0, 0),   # alef hamza above
    0x0624: (0xFE85, 0xFE86, 0, 0),   # waw hamza
    0x0625: (0xFE87, 0xFE88, 0, 0),   # alef hamza below
    0x0626: (0xFE89, 0xFE8A, 0xFE8B, 0xFE8C),  # yeh hamza
    0x0627: (0xFE8D, 0xFE8E, 0, 0),   # alef
    0x0628: (0xFE8F, 0xFE90, 0xFE91, 0xFE92),  # beh
    0x0629: (0xFE93, 0xFE94, 0, 0),   # teh marbuta
    0x062A: (0xFE95, 0xFE96, 0xFE97, 0xFE98),  # teh
    0x062B: (0xFE99, 0xFE9A, 0xFE9B, 0xFE9C),  # theh
    0x062C: (0xFE9D, 0xFE9E, 0xFE9F, 0xFEA0),  # jeem
    0x062D: (0xFEA1, 0xFEA2, 0xFEA3, 0xFEA4),  # hah
    0x062E: (0xFEA5, 0xFEA6, 0xFEA7, 0xFEA8),  # khah
    0x062F: (0xFEA9, 0xFEAA, 0, 0),   # dal
    0x0630: (0xFEAB, 0xFEAC, 0, 0),   # thal
    0x0631: (0xFEAD, 0xFEAE, 0, 0),   # reh
    0x0632: (0xFEAF, 0xFEB0, 0, 0),   # zain
    0x0633: (0xFEB1, 0xFEB2, 0xFEB3, 0xFEB4),  # seen
    0x0634: (0xFEB5, 0xFEB6, 0xFEB7, 0xFEB8),  # sheen
    0x0635: (0xFEB9, 0xFEBA, 0xFEBB, 0xFEBC),  # sad
    0x0636: (0xFEBD, 0xFEBE, 0xFEBF, 0xFEC0),  # dad
    0x0637: (0xFEC1, 0xFEC2, 0xFEC3, 0xFEC4),  # tah
    0x0638: (0xFEC5, 0xFEC6, 0xFEC7, 0xFEC8),  # zah
    0x0639: (0xFEC9, 0xFECA, 0xFECB, 0xFECC),  # ain
    0x063A: (0xFECD, 0xFECE, 0xFECF, 0xFED0),  # ghain
    0x0640: (0x0640, 0x0640, 0x0640, 0x0640),  # tatweel
    0x0641: (0xFED1, 0xFED2, 0xFED3, 0xFED4),  # feh
    0x0642: (0xFED5, 0xFED6, 0xFED7, 0xFED8),  # qaf
    0x0643: (0xFED9, 0xFEDA, 0xFEDB, 0xFEDC),  # kaf
    0x0644: (0xFEDD, 0xFEDE, 0xFEDF, 0xFEE0),  # lam
    0x0645: (0xFEE1, 0xFEE2, 0xFEE3, 0xFEE4),  # meem
    0x0646: (0xFEE5, 0xFEE6, 0xFEE7, 0xFEE8),  # noon
    0x0647: (0xFEE9, 0xFEEA, 0xFEEB, 0xFEEC),  # heh
    0x0648: (0xFEED, 0xFEEE, 0, 0),   # waw
    0x0649: (0xFEEF, 0xFEF0, 0, 0),   # alef maksura
    0x064A: (0xFEF1, 0xFEF2, 0xFEF3, 0xFEF4),  # yeh
}
FORMS: dict[str, tuple[str, str, str, str]] = {
    chr(k): tuple(chr(v) if v else "" for v in vs) for k, vs in _F.items()
}

# lam + alef-variant -> (isolated, final) ligature glyphs
LAM = chr(0x0644)
LIGATURES: dict[str, tuple[str, str]] = {
    chr(0x0622): (chr(0xFEF5), chr(0xFEF6)),  # lam-alef madda
    chr(0x0623): (chr(0xFEF7), chr(0xFEF8)),  # lam-alef hamza above
    chr(0x0625): (chr(0xFEF9), chr(0xFEFA)),  # lam-alef hamza below
    chr(0x0627): (chr(0xFEFB), chr(0xFEFC)),  # lam-alef
}

ISOLATED, FINAL, INITIAL, MEDIAL = 0, 1, 2, 3

# delimiters per the reference (arabic_helper.py:104-105)
ARABIC_DELIMITERS = ["،", "ً", "ّ", "»"]
DELIMITERS = [" ", ",", "-", ".", '"', ":"]

# presentation form -> base letter(s); ligature glyphs map to the
# REVERSED base pair because backward mapping runs on visual-order
# text before the final reorder (reference arabic_helper.py:194-202)
BACKWARD: dict[str, str] = {}
for base, forms in FORMS.items():
    for f in forms:
        if f and f != base:
            BACKWARD[f] = base
for alef, (iso, fin) in LIGATURES.items():
    BACKWARD[iso] = alef + LAM  # reversed "lam alef"
    BACKWARD[fin] = alef + LAM


def _joins_forward(ch: str) -> bool:
    f = FORMS.get(ch)
    return bool(f and (f[INITIAL] or f[MEDIAL]))


def _joins_backward(ch: str) -> bool:
    f = FORMS.get(ch)
    return bool(f and (f[FINAL] or f[MEDIAL]))


def shape(text: str) -> str:
    """Logical base letters → presentation forms (contextual joining +
    lam-alef ligatures); non-Arabic chars pass through and break
    joining."""
    out: list[str] = []
    prev_joins = False  # previous emitted glyph connects forward
    i = 0
    while i < len(text):
        ch = text[i]
        forms = FORMS.get(ch)
        if forms is None:
            out.append(ch)
            prev_joins = False
            i += 1
            continue
        if ch == LAM and i + 1 < len(text) and text[i + 1] in LIGATURES:
            iso, fin = LIGATURES[text[i + 1]]
            out.append(fin if prev_joins else iso)
            prev_joins = False  # alef never joins forward
            i += 2
            continue
        nxt = text[i + 1] if i + 1 < len(text) else ""
        links_next = _joins_forward(ch) and _joins_backward(nxt)
        if prev_joins and links_next:
            form = MEDIAL
        elif prev_joins:
            form = FINAL
        elif links_next:
            form = INITIAL
        else:
            form = ISOLATED
        out.append(forms[form] or forms[ISOLATED])
        prev_joins = links_next
        i += 1
    return "".join(out)


def unshape(text: str) -> str:
    """Presentation forms → base letters (ligatures expand to their
    reversed pair, consistent with visual order)."""
    return "".join(BACKWARD.get(c, c) for c in text)


def is_arabic_word(word: str) -> bool:
    """Every char in an Arabic block (arabic_helper.py:138-145)."""
    if not word:
        return False
    return all(
        "؀" <= c <= "ۿ"
        or "ݐ" <= c <= "ݿ"
        or "ﭐ" <= c <= "﷽"
        or "ﹰ" <= c <= "ﻼ"
        for c in word
    )


def is_arabic_line(text: str) -> bool:
    return any(is_arabic_word(w) for w in text.split())


def _is_arabic_char(c: str) -> bool:
    return c in FORMS or c in BACKWARD or c in ARABIC_DELIMITERS


def reverse(text: str) -> str:
    """The reference's ``_reverse`` (arabic_helper.py:247-321): split
    into Arabic/non-Arabic sequences; delimiters bind to the current
    sequence, EXCEPT a non-Arabic sequence's trailing delimiters,
    which start the following Arabic sequence (and the final
    sequence's trailing delimiters, which become a trailing Arabic
    sequence). Then reverse the chars of Arabic sequences and the
    order of all sequences — the line flips RTL while embedded LTR
    spans keep their internal order."""
    sequences: list[tuple[list[str], bool]] = []
    chars: list[str] = []
    arabic = True

    def pop_tail() -> list[str]:
        tail: list[str] = []
        while chars and chars[-1] in DELIMITERS:
            tail.insert(0, chars.pop())
        return tail

    for c in text:
        if _is_arabic_char(c):
            if not arabic:
                if chars:
                    tail = pop_tail()
                    sequences.append((chars, False))
                    chars = tail
                arabic = True
        elif c not in DELIMITERS:
            if arabic:
                if chars:
                    sequences.append((chars, True))
                    chars = []
                arabic = False
        chars.append(c)
    if chars:
        tail = pop_tail()
        sequences.append((chars, arabic))
        if tail:
            sequences.append((tail, True))
    parts = [
        "".join(reversed(cs)) if is_ar else "".join(cs)
        for cs, is_ar in reversed(sequences)
    ]
    return "".join(parts)


class ArabicHelper:
    """Reference-API shim (core/arabic_helper.py:8-157)."""

    def string_to_label_form(self, text: str) -> str:
        return reverse(text)

    def label_form_to_string(self, text: str) -> str:
        return reverse(text)

    def string_to_visual_form(self, text: str) -> str:
        return reverse(shape(text))

    def visual_form_to_string(self, text: str) -> str:
        return reverse(unshape(text))

    def label_form_to_visual_form(self, text: str) -> str:
        return self.string_to_visual_form(self.label_form_to_string(text))

    def visual_form_to_label_form(self, text: str) -> str:
        return self.string_to_label_form(self.visual_form_to_string(text))

    def is_arabic_word(self, word: str) -> bool:
        return is_arabic_word(word)

    def is_arabic_line(self, text: str) -> bool:
        return is_arabic_line(text)

    def ligatures_mapping(self, text: str) -> list[list[int]]:
        """Glyph → base-char index mapping (arabic_helper.py:157-174):
        entry i lists the positions the i-th visual glyph expands to."""
        result: list[list[int]] = []
        counter = 0
        for ch in text:
            mapped = BACKWARD.get(ch)
            if mapped is None:
                result.append([counter])
                counter += 1
            else:
                result.append(list(range(counter, counter + len(mapped))))
                counter += len(mapped)
        return result
