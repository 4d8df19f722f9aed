"""CJK transliteration for slugify — public unidecode-style tables.

Reference parity: python-slugify runs text through unidecode before
slug processing (reference new_document_actions.py:30), so CJK titles
romanize instead of vanishing. unidecode isn't installed in-container;
these are curated subsets of its PUBLIC conventions:

  - Han (CJK Unified Ideographs): toneless pinyin, capitalized with a
    TRAILING SPACE per character — unidecode's x0XX CJK table style
    ("中国" -> "Zhong Guo ") — so adjacent ideographs slug into
    dash-separated syllables. Curated ~140 high-frequency characters
    (policy/government/geography vocabulary); unmapped ideographs pass
    through and fold to a dash like before.
  - Kana (hiragana + katakana, incl. voiced/半-voiced and small forms):
    complete lowercase romaji table.
  - Hangul syllables (U+AC00..U+D7A3): ALGORITHMIC jamo decomposition
    (lead = s/588, vowel = s%588/28, tail = s%28 — the Unicode-defined
    arithmetic), romanized by the standard jamo tables; no syllable
    table needed, full coverage.

Both engines share these constants: the Spark side builds a gated
per-character fold (only strings containing CJK pay for it); the
DuckDB oracle applies the identical fold unconditionally (identity on
non-CJK text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-defined Hangul syllable decomposition romanizations (jamo)
HANGUL_LEAD = [
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "",
    "j", "jj", "ch", "k", "t", "p", "h",
]
HANGUL_VOWEL = [
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
    "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i",
]
HANGUL_TAIL = [
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
    "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch",
    "k", "t", "p", "h",
]

_HIRAGANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "を": "wo", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "っ": "tsu", "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "ゎ": "wa",
    "ゔ": "vu",
}
# katakana shares romaji with hiragana at a fixed +0x60 codepoint shift
_KATA_SHIFT = 0x60
KANA = dict(_HIRAGANA)
KANA.update({chr(ord(k) + _KATA_SHIFT): v for k, v in _HIRAGANA.items()})

# unidecode CJK convention: capitalized pinyin + trailing space
HANZI = {
    "中": "Zhong", "国": "Guo", "人": "Ren", "大": "Da", "小": "Xiao",
    "山": "Shan", "水": "Shui", "火": "Huo", "日": "Ri", "月": "Yue",
    "年": "Nian", "气": "Qi", "候": "Hou", "变": "Bian", "化": "Hua",
    "政": "Zheng", "策": "Ce", "法": "Fa", "律": "Lu", "环": "Huan",
    "境": "Jing", "能": "Neng", "源": "Yuan", "碳": "Tan", "排": "Pai",
    "放": "Fang", "减": "Jian", "绿": "Lu", "色": "Se", "发": "Fa",
    "展": "Zhan", "规": "Gui", "划": "Hua", "条": "Tiao", "例": "Li",
    "管": "Guan", "理": "Li", "办": "Ban", "通": "Tong", "知": "Zhi",
    "方": "Fang", "案": "An", "行": "Xing", "动": "Dong", "计": "Ji",
    "公": "Gong", "告": "Gao", "试": "Shi", "点": "Dian", "实": "Shi",
    "施": "Shi", "意": "Yi", "见": "Jian", "建": "Jian", "设": "She",
    "保": "Bao", "护": "Hu", "污": "Wu", "染": "Ran", "防": "Fang",
    "治": "Zhi", "生": "Sheng", "态": "Tai", "文": "Wen", "明": "Ming",
    "电": "Dian", "力": "Li", "煤": "Mei", "石": "Shi", "油": "You",
    "天": "Tian", "然": "Ran", "新": "Xin", "可": "Ke", "再": "Zai",
    "节": "Jie", "低": "Di", "经": "Jing", "济": "Ji", "社": "She",
    "会": "Hui", "部": "Bu", "委": "Wei", "员": "Yuan", "省": "Sheng",
    "市": "Shi", "县": "Xian", "区": "Qu", "北": "Bei", "京": "Jing",
    "上": "Shang", "海": "Hai", "广": "Guang", "东": "Dong", "西": "Xi",
    "南": "Nan", "河": "He", "江": "Jiang", "湖": "Hu", "林": "Lin",
    "农": "Nong", "业": "Ye", "工": "Gong", "城": "Cheng", "乡": "Xiang",
    "土": "Tu", "地": "Di", "资": "Zi", "金": "Jin", "风": "Feng",
    "光": "Guang", "热": "Re", "核": "He", "废": "Fei", "物": "Wu",
    "循": "Xun", "标": "Biao", "准": "Zhun", "体": "Ti", "系": "Xi",
    "家": "Jia", "务": "Wu", "院": "Yuan", "和": "He", "的": "De",
    "对": "Dui", "于": "Yu", "关": "Guan", "加": "Jia", "强": "Qiang",
    "促": "Cu", "进": "Jin", "应": "Ying", "温": "Wen", "室": "Shi",
    "全": "Quan", "球": "Qiu", "联": "Lian", "合": "He", "报": "Bao",
    "质": "Zhi", "量": "Liang", "监": "Jian", "测": "Ce", "评": "Ping",
    "价": "Jia", "制": "Zhi", "度": "Du", "目": "Mu", "录": "Lu",
    # Japanese shinjitai variants of the above (unidecode romanizes
    # kanji via its Chinese readings)
    "気": "Qi", "変": "Bian", "動": "Dong", "関": "Guan", "連": "Lian",
    "対": "Dui", "発": "Fa", "戦": "Zhan", "処": "Chu", "産": "Chan",
    "応": "Ying", "環": "Huan", "県": "Xian", "価": "Jia", "済": "Ji",
}

# Arabic (+ Persian extensions): Buckwalter-flavoured consonant
# romanization in the unidecode style — emphatics lose their dot
# (s/d/t/z), ayn/hamza become apostrophes (slug separators), short
# vowel/tashkil marks drop, Arabic-Indic digits map to ASCII.
ARABIC = {
    "ا": "a", "أ": "a", "إ": "i", "آ": "a", "ؤ": "u", "ئ": "y",
    "ء": "'", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h",
    "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s",
    "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "'",
    "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m",
    "ن": "n", "ه": "h", "ة": "h", "و": "w", "ي": "y", "ى": "a",
    # Persian/Urdu letters in the Arabic block
    "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g", "ک": "k", "ی": "y",
    # tashkil (short vowels / shadda / sukun) drop in romanization
    "ً": "", "ٌ": "", "ٍ": "", "َ": "",
    "ُ": "", "ِ": "", "ّ": "", "ْ": "",
    "ـ": "",  # tatweel
    "٠": "0", "١": "1", "٢": "2", "٣": "3", "٤": "4",
    "٥": "5", "٦": "6", "٧": "7", "٨": "8", "٩": "9",
    "،": ",", "؛": ";", "؟": "?",
}

# Devanagari: per-character ISO-flavoured romanization (consonants
# carry the inherent 'a', matras append their vowel, virama drops) —
# the same naive per-char concatenation a unidecode-style table
# produces; conjunct-aware schemes need more than per-char state.
DEVANAGARI = {
    "अ": "a", "आ": "aa", "इ": "i", "ई": "ii", "उ": "u", "ऊ": "uu",
    "ऋ": "r", "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au",
    "ं": "n", "ः": "h", "ँ": "n",
    "क": "ka", "ख": "kha", "ग": "ga", "घ": "gha", "ङ": "nga",
    "च": "cha", "छ": "chha", "ज": "ja", "झ": "jha", "ञ": "nya",
    "ट": "ta", "ठ": "tha", "ड": "da", "ढ": "dha", "ण": "na",
    "त": "ta", "थ": "tha", "द": "da", "ध": "dha", "न": "na",
    "प": "pa", "फ": "pha", "ब": "ba", "भ": "bha", "म": "ma",
    "य": "ya", "र": "ra", "ल": "la", "व": "va",
    "श": "sha", "ष": "sha", "स": "sa", "ह": "ha",
    "ऽ": "'", "़": "",
    "ा": "aa", "ि": "i", "ी": "ii", "ु": "u", "ू": "uu", "ृ": "r",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au", "्": "",
    "।": ".", "॥": ".",
    "०": "0", "१": "1", "२": "2", "३": "3", "४": "4",
    "५": "5", "६": "6", "७": "7", "८": "8", "९": "9",
}

# the one per-character lookup table both engines fold with
CJK_MAP: dict[str, str] = {
    **KANA,
    **{k: v + " " for k, v in HANZI.items()},
    **ARABIC,
    **DEVANAGARI,
}

# gate: any Han / kana / Hangul-syllable / Arabic / Devanagari char?
CJK_GATE_RE = "[぀-ヿ一-鿿가-힣؀-ۿऀ-ॿ]"

_HANGUL_BASE, _HANGUL_LAST = 0xAC00, 0xD7A3


# one string literal holding the whole fold table: a create_map of
# ~700 F.lit children costs ~700 py4j round trips PER slugify reference
# site at plan-build time (measured ~4 s of driver CPU on the e2e
# query); str_to_map(lit, ...) is 3 calls and constant-folds to the
# same map literal before execution
_MAP_PAIR_SEP = "\x01"
_MAP_KV_SEP = "\x02"


def _map_str() -> str:
    return _MAP_PAIR_SEP.join(
        f"{k}{_MAP_KV_SEP}{v}" for k, v in CJK_MAP.items()
    )


def fold_cjk_col(s: Column) -> Column:
    """Per-character CJK romanization fold (Spark side), gated so
    non-CJK strings (the overwhelming hot path) skip it entirely."""
    m = F.str_to_map(
        F.lit(_map_str()), F.lit(_MAP_PAIR_SEP), F.lit(_MAP_KV_SEP)
    )
    lead = F.array(*[F.lit(x) for x in HANGUL_LEAD])
    vowel = F.array(*[F.lit(x) for x in HANGUL_VOWEL])
    tail = F.array(*[F.lit(x) for x in HANGUL_TAIL])

    def per_char(c: Column) -> Column:
        u = F.ascii(c)
        sidx = u - F.lit(_HANGUL_BASE)
        hangul = F.concat(
            F.element_at(lead, (sidx / 588).cast("int") + 1),
            F.element_at(vowel, ((sidx % 588) / 28).cast("int") + 1),
            F.element_at(tail, (sidx % 28).cast("int") + 1),
        )
        return (
            F.when(
                (u >= _HANGUL_BASE) & (u <= _HANGUL_LAST), hangul
            ).otherwise(F.coalesce(F.element_at(m, c), c))
        )

    folded = F.aggregate(
        F.split(s, ""), F.lit(""), lambda acc, c: F.concat(acc, per_char(c))
    )
    return F.when(s.rlike(CJK_GATE_RE), folded).otherwise(s)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_list(items: list[str]) -> str:
    return "[" + ",".join(_sql_quote(x) for x in items) + "]"


def fold_cjk_sql(col: str) -> str:
    """The identical fold as DuckDB SQL, gated behind the same
    contains-CJK regex as the Spark side — DuckDB's per-char MAP
    lookup costs ~0.4 ms/char, so ungated it dominates every
    slugify-bearing oracle (measured 12 s on 500 60-char names; the
    gate cuts it to ~10 ms on a non-CJK corpus, and DuckDB's
    selection-vector CASE only folds the rows that match)."""
    gate = (
        "regexp_matches({c}, "
        "'[\\x{{3040}}-\\x{{30ff}}\\x{{4e00}}-\\x{{9fff}}\\x{{ac00}}-\\x{{d7a3}}"
        "\\x{{0600}}-\\x{{06ff}}\\x{{0900}}-\\x{{097f}}]')"
    ).format(c=col)
    map_lit = (
        "MAP {"
        + ",".join(f"{_sql_quote(k)}:{_sql_quote(v)}" for k, v in CJK_MAP.items())
        + "}"
    )
    b = _HANGUL_BASE
    hangul = (
        f"{_sql_list(HANGUL_LEAD)}[((unicode(c)-{b})//588)::int + 1]"
        f" || {_sql_list(HANGUL_VOWEL)}[(((unicode(c)-{b})%588)//28)::int + 1]"
        f" || {_sql_list(HANGUL_TAIL)}[((unicode(c)-{b})%28)::int + 1]"
    )
    per_char = (
        f"CASE WHEN unicode(c) BETWEEN {b} AND {_HANGUL_LAST} THEN {hangul} "
        f"ELSE coalesce(list_extract(map_extract({map_lit}, c), 1), c) END"
    )
    folded = (
        f"array_to_string(list_transform(string_split_regex({col}, ''), "
        f"c -> {per_char}), '')"
    )
    return f"CASE WHEN {gate} THEN {folded} ELSE {col} END"
