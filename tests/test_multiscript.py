"""Unicode script identification: the generic classifier over hand-built
mixed-script strings (the synth path is pinned end-to-end by the
text_langid_multiscript gate oracle; these cover what the closed-form
fixture can't — mixed scripts, ties, unknown codepoints, empties), plus a
Python mirror of the synthesizer itself."""

from __future__ import annotations

import hashlib

from html_parser_spark.functions import text as TXT


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, utext string")
    return {r.doc_id: r for r in TXT.script_profile(df).collect()}


def test_script_profile_mixed_and_edge_cases(spark):
    got = _profile(
        spark,
        [
            (0, "hello мир"),          # latin 5, cyrillic 3 -> latin
            (1, "добрый day"),         # cyrillic 6, latin 3 -> cyrillic
            (2, "abc где"),            # 3 vs 3 tie -> block order: latin
            (3, ""),                   # empty
            (4, "1234 !?"),            # no letters at all -> none, other=6
            (5, "日本語のテキスト"),     # CJK + Hiragana (hiragana=other)
            (6, "שלום עולם"),          # hebrew only (RTL)
            (7, "naïve café"),         # latin 7, accented 2 -> latin
        ],
    )
    assert (got[0].n_latin, got[0].n_cyrillic, got[0].script_pred) == (5, 3, "latin")
    assert got[1].script_pred == "cyrillic"
    assert (got[2].n_latin, got[2].n_cyrillic, got[2].script_pred) == (3, 3, "latin")
    assert (got[3].n_chars, got[3].script_pred) == (0, "none")
    assert (got[4].n_other, got[4].n_space, got[4].script_pred) == (6, 1, "none")
    # 日本語 = 3 CJK ideographs; のテキスト = 5 kana, outside every range
    assert (got[5].n_cjk, got[5].n_other, got[5].script_pred) == (3, 5, "cjk")
    assert (got[6].n_hebrew, got[6].n_space, got[6].script_pred) == (8, 1, "hebrew")
    assert (got[7].n_latin, got[7].n_accented, got[7].script_pred) == (7, 2, "latin")


def test_synth_multiscript_matches_python_mirror(spark):
    rows = [(i, f"some text {i}") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.script_expected, r.utext)
           for r in TXT.synth_multiscript(df).collect()}
    for doc_id, text in rows:
        name, base, size = TXT.SCRIPT_BLOCKS[doc_id % 8]
        hx = (hashlib.md5((text + "uni0").encode()).hexdigest()
              + hashlib.md5((text + "uni1").encode()).hexdigest())
        want = "".join(
            " " if i % 5 == 4
            else chr(base + int(hx[2 * i : 2 * i + 2], 16) % size)
            for i in range(TXT.MULTISCRIPT_CHARS)
        )
        assert got[doc_id] == (name, want)


def test_synth_multiscript_predicts_expected(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    uni = TXT.synth_multiscript(docs)
    prof = TXT.script_profile(uni)
    bad = (
        prof.join(uni.select("doc_id", "script_expected"), "doc_id")
        .where("script_pred <> script_expected")
        .count()
    )
    assert bad == 0


def test_token_count_script_aware(spark):
    rows = [
        (0, "hello world"),
        (1, "日本語のテキストです"),         # 3 ideographs + 7 kana = 10
        (2, "한국어텍스트 mixed latin"),     # 6 hangul + 2 latin words
        (3, ""),
        (4, "中文 and english mixed"),      # 2 ideographs + 3 latin words
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_tokens_aware)
        for r in TXT.token_count_script_aware(df).collect()
    }
    assert got == {0: (2, 2), 1: (1, 10), 2: (3, 8), 3: (0, 0), 4: (4, 5)}


def test_chunk_windows_properties(spark):
    from html_parser_spark.functions.sampling import chunk_windows

    texts = {
        0: "",                                    # 1 chunk, the empty word
        1: " ".join(f"w{i}" for i in range(10)),  # < window: 1 chunk
        2: " ".join(f"w{i}" for i in range(16)),  # == window: 1 chunk
        3: " ".join(f"w{i}" for i in range(17)),  # window+1: 2 chunks
        4: " ".join(f"w{i}" for i in range(40)),  # 3 chunks
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    rows = chunk_windows(df, window=16, stride=12).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [len(by_doc[d]) for d in range(5)] == [1, 1, 1, 2, 3]
    for d, text in texts.items():
        words = text.split(" ")
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_idx)
        # every word covered, in order, with the configured overlap
        for i, r in enumerate(chunks):
            assert r.chunk.split(" ") == words[i * 12 : i * 12 + 16]
            assert r.n_tokens == len(words[i * 12 : i * 12 + 16])
        covered = set()
        for i, _ in enumerate(chunks):
            covered.update(range(i * 12, min(i * 12 + 16, len(words))))
        assert covered == set(range(len(words)))


def test_multiplication_division_signs_are_other(spark):
    """U+00D7 (×) and U+00F7 (÷) sit inside the Latin-1 letter block but are
    NOT letters: the accented ranges exclude them (ADVICE r04), so they land
    in n_other — and the block neighbours Ö/Ø and ö/ø still classify."""
    got = _profile(spark, [(0, "3×4÷2"), (1, "ÖØöø")])
    assert (got[0].n_accented, got[0].n_other) == (0, 5)  # digits + × ÷
    assert (got[1].n_accented, got[1].n_other) == (4, 0)
