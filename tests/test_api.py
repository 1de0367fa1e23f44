"""Reference-API parity: GlinerModel mirrors Model::inference usage
(/root/reference/examples/inference.cpp, tests/test.cpp)."""

import pytest

from gliner_spark.api import GlinerModel
from gliner_spark.config import TOKEN_LEVEL


def test_inference_kyiv_golden_like_reference_example():
    # mirrors examples/inference.cpp:11-18 / tests/test.cpp:80-114
    model = GlinerModel(max_width=12, max_length=512)
    texts = ["Kyiv is the capital of Ukraine."]
    entities = ["city", "country", "river", "person", "car"]
    out = model.inference(texts, entities)
    assert len(out) == 1
    spans = out[0]
    assert [(s[0], s[1], s[2], s[3]) for s in spans] == [
        (0, 4, "Kyiv", "city"),
        (23, 30, "Ukraine", "country"),
    ]
    assert all(abs(s[4] - 0.9) < 0.1 for s in spans)


def test_inference_empty_guard(capsys):
    model = GlinerModel()
    assert model.inference([], ["city"]) == []
    assert model.inference(["x"], []) == []
    assert "Empty texts or entities" in capsys.readouterr().err


def test_library_mode_stages():
    # tests/test.cpp:41-68: stages are public API
    model = GlinerModel()
    toks = model.tokenize_text("Hello world")
    assert [t[2] for t in toks] == ["Hello", "world"]
    batch = model.batch_tokenize_text(["Hello world", "I love C++"])
    assert [t[2] for t in batch[1]] == ["I", "love", "C", "+", "+"]


def test_token_level_model():
    model = GlinerModel(model_type=TOKEN_LEVEL)
    out = model.inference(
        ["Kyiv is the capital of Ukraine."],
        ["city", "country", "river", "person", "car"],
    )
    assert [(s[2], s[3]) for s in out[0]] == [
        ("Kyiv", "city"), ("Ukraine", "country"),
    ]


@pytest.fixture(scope="session")
def spark():
    from gliner_spark.session import build_session

    s = build_session(app_name="gliner-tests", cores=4)
    yield s
    s.stop()


def test_inference_df_matches_local(spark):
    model = GlinerModel()
    texts = [
        "Kyiv is the capital of Ukraine.",
        "Elon Musk visited Paris and Kyiv near the Dnipro.",
    ]
    entities = ["city", "country", "river", "person", "car"]
    local = model.inference(texts, entities)
    df = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )
    rows = model.inference_df(df, entities).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.m_start, r.m_end, r.m_text, r.label)
        )
    for i, spans in enumerate(local):
        assert sorted(got[f"u{i}"]) == sorted(
            (s[0], s[1], s[2], s[3]) for s in spans
        )
