"""The gated chinese-roberta feature path (text/chinese_bert.py:15-36
parity) exercised end-to-end against a tiny local BERT checkpoint.

The environment has no network, so the test materializes a randomly
initialized ``BertForMaskedLM`` + ``BertTokenizer`` on disk and points
``DIFF_VITS_BERT_PATH`` at it — the same injection seam a user with the
real chinese-roberta-wwm-ext-large download would use.
"""
import os

import numpy as np
import pytest

from diff_vits_tpu.text.frontend import get_bert

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertForMaskedLM, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "我", "们", "好", "吗", "。"]
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    tok = BertTokenizer(str(vocab_file))
    tok.save_pretrained(str(d))

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=16,
                     num_hidden_layers=3, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=32)
    BertForMaskedLM(cfg).save_pretrained(str(d))
    return str(d)


def test_get_bert_zero_mock_without_model(monkeypatch):
    monkeypatch.delenv("DIFF_VITS_BERT_PATH", raising=False)
    word2ph = [1, 2, 2, 1]
    feats = get_bert("我们好", word2ph, "ZH")
    assert feats.shape == (1024, sum(word2ph))
    assert not feats.any()


def test_get_bert_en_always_zero_mock():
    # english_bert_mock.py:4 — EN features are zeros even with a model set
    feats = get_bert("hello", [1, 3], "EN")
    assert feats.shape == (1024, 4)
    assert not feats.any()


def test_zh_bert_features_repeat_semantics(tiny_bert_dir, monkeypatch):
    import torch
    from transformers import AutoModelForMaskedLM, AutoTokenizer

    monkeypatch.setenv("DIFF_VITS_BERT_PATH", tiny_bert_dir)
    text = "我们好吗。"
    # tokens: [CLS] + 5 chars + [SEP] = 7 entries; word2ph must line up
    # one-per-token like the reference's padded word2ph (chinese.py:64-73)
    word2ph = [1, 2, 1, 3, 1, 2, 1]
    feats = get_bert(text, word2ph, "ZH")
    assert feats.shape == (16, sum(word2ph))

    # oracle: hidden_states[-3], phone i repeats its token's vector
    tok = AutoTokenizer.from_pretrained(tiny_bert_dir)
    model = AutoModelForMaskedLM.from_pretrained(tiny_bert_dir).eval()
    with torch.no_grad():
        out = model(**tok(text, return_tensors="pt"),
                    output_hidden_states=True)
    hidden = out.hidden_states[-3][0].numpy()  # [7, 16]
    want = np.concatenate(
        [np.tile(hidden[i], (n, 1)) for i, n in enumerate(word2ph)], 0).T
    np.testing.assert_allclose(feats, want, rtol=1e-6, atol=1e-6)


def test_zh_bert_features_mismatched_word2ph_raises(tiny_bert_dir,
                                                    monkeypatch):
    monkeypatch.setenv("DIFF_VITS_BERT_PATH", tiny_bert_dir)
    with pytest.raises(AssertionError):
        get_bert("我们好吗。", [1, 1], "ZH")
