"""Byte-level BPE reader parity tests.

No pretrained GPT-2/OPT tokenizer is reachable (zero egress), so each test
TRAINS a small but real byte-level BPE with the ``tokenizers`` library
(ships with transformers), saves it in both on-disk formats the reader
supports (``tokenizer.json`` and ``vocab.json``+``merges.txt``), and checks
our dependency-free reader reproduces the library's token ids exactly —
the same strategy ``test_sentencepiece.py`` uses for SentencePiece."""

import json
from pathlib import Path

import pytest

from vlm_tpu.data.bpe import (ByteLevelBPE, _pretokenize_fallback,
                              bytes_to_unicode, load_bpe_dir,
                              load_tokenizer_json, pretokenize)
from vlm_tpu.data.tokenizer import load_tokenizer

tokenizers = pytest.importorskip("tokenizers")

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Is the person in the photo male or female? Answer: female",
    "Question: what colors are the upper and lower clothes. Answer:",
    "I'll say we're done, it's 42 degrees at 10:30pm!",
    "  leading spaces,  internal   runs\tand\nnewlines",
    "naïve café — émigré; 東京 12345 ¡hola! señor",
    "he said 'stop' and they didn't",
] * 4

SAMPLES = [
    "hello world",
    "The person is wearing a red shirt and blue jeans.",
    "I'm sure they're right, isn't it? We've 99 problems.",
    "  double  spaces   and a trailing run   ",
    "tabs\tand\nnewlines\r\nmixed \t whitespace",
    "punct!!! ... --- ??? 'quoted' (parens) [brackets]",
    "unicode: naïve café 東京 ¡hola! ∑x²=π",
    "numbers 123 mixed42with letters 3.14159",
    "",
    " ",
    "'s standalone contraction at start",
    "UPPER lower MiXeD",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A real ByteLevel BPE trained by the tokenizers library, saved in
    both formats, plus the library tokenizer for golden encodes."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers import trainers
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False)
    tok.train_from_iterator(CORPUS, trainer)
    d = tmp_path_factory.mktemp("bpe")
    tok.save(str(d / "tokenizer.json"))
    pair_dir = d / "pair"
    pair_dir.mkdir()
    tok.model.save(str(pair_dir))       # vocab.json + merges.txt
    # OPT-style config so the pair loader resolves special ids
    (pair_dir / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "</s>", "eos_token": "</s>",
        "pad_token": "<pad>", "unk_token": "</s>"}))
    return d, tok


class TestByteTable:
    def test_bijective_all_bytes(self):
        enc = bytes_to_unicode()
        assert len(enc) == 256
        assert len(set(enc.values())) == 256
        # printable ASCII maps to itself
        assert enc[ord("A")] == "A"
        assert enc[ord("!")] == "!"
        # space and control bytes map above 255
        assert ord(enc[ord(" ")]) >= 256
        assert ord(enc[0]) >= 256


class TestPretokenizer:
    @pytest.mark.parametrize("text", SAMPLES)
    def test_fallback_matches_regex(self, text):
        if pretokenize is _pretokenize_fallback:
            pytest.skip("regex module unavailable — nothing to compare")
        import regex
        pat = regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
            r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
        assert _pretokenize_fallback(text) == pat.findall(text)

    def test_fallback_matches_regex_fuzz(self):
        import random
        import regex
        pat = regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
            r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
        rng = random.Random(0)
        alphabet = "ab N1 .'\t\n é東!"
        for _ in range(300):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 24)))
            assert _pretokenize_fallback(s) == pat.findall(s), repr(s)

    def test_lossless(self):
        for text in SAMPLES:
            assert "".join(pretokenize(text)) == text


class TestEncodeParity:
    @pytest.mark.parametrize("fmt", ["tokenizer_json", "pair"])
    @pytest.mark.parametrize("text", [s for s in SAMPLES if s.strip()])
    def test_ids_match_tokenizers_lib(self, trained, fmt, text):
        d, lib = trained
        golden = lib.encode(text).ids
        if fmt == "tokenizer_json":
            ours = load_tokenizer_json(str(d / "tokenizer.json"))
        else:
            ours = load_bpe_dir(str(d / "pair"))
        assert ours.encode(text) == golden

    def test_decode_roundtrip(self, trained):
        d, lib = trained
        ours = load_tokenizer_json(str(d / "tokenizer.json"))
        for text in SAMPLES:
            ids = ours.encode(text)
            assert ours.decode(ids) == lib.decode(ids)

    def test_add_bos(self, trained):
        d, _ = trained
        ours = load_bpe_dir(str(d / "pair"))
        ids = ours.encode("hello", add_bos=True)
        assert ids[0] == ours.bos_id

    def test_special_ids_resolved_opt_style(self, trained):
        d, lib = trained
        ours = load_bpe_dir(str(d / "pair"))
        # tokenizer_config.json: bos=eos=</s>, pad=<pad>
        assert ours.bos_id == ours.eos_id == lib.token_to_id("</s>")
        assert ours.pad_id == lib.token_to_id("<pad>")

    def test_specials_skipped_in_decode(self, trained):
        d, _ = trained
        ours = load_bpe_dir(str(d / "pair"))
        ids = ours.encode("hello world")
        padded = [ours.pad_id] + ids + [ours.eos_id, ours.pad_id]
        assert ours.decode(padded) == ours.decode(ids)


class TestLoadTokenizerIntegration:
    def test_bpe_dir_without_transformers(self, trained, monkeypatch):
        """A real OPT-style tokenizer directory must load through the BPE
        reader when transformers is unavailable — the case that previously
        degraded to byte-fallback quality with only a WARN."""
        d, lib = trained
        import vlm_tpu.data.tokenizer as tk
        monkeypatch.setattr(
            tk, "HFTokenizer",
            lambda path: (_ for _ in ()).throw(
                ImportError("transformers not installed")))
        tok = load_tokenizer(str(d / "pair"))
        assert isinstance(tok, ByteLevelBPE)
        assert tok.encode("hello world") == lib.encode("hello world").ids

    def test_tokenizer_json_file_path(self, trained, monkeypatch):
        d, lib = trained
        import vlm_tpu.data.tokenizer as tk
        monkeypatch.setattr(
            tk, "HFTokenizer",
            lambda path: (_ for _ in ()).throw(ImportError("absent")))
        tok = load_tokenizer(str(d / "tokenizer.json"))
        assert isinstance(tok, ByteLevelBPE)
        assert tok.encode("it's 42") == lib.encode("it's 42").ids

    def test_missing_files_still_warn_and_fall_back(self, tmp_path,
                                                    monkeypatch, capsys):
        import vlm_tpu.data.tokenizer as tk
        monkeypatch.setattr(
            tk, "HFTokenizer",
            lambda path: (_ for _ in ()).throw(ImportError("absent")))
        tok = load_tokenizer(str(tmp_path))    # empty dir
        from vlm_tpu.data.tokenizer import ByteTokenizer
        assert isinstance(tok, ByteTokenizer)
        assert "WARN" in capsys.readouterr().err
