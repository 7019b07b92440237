"""Reference-API compat layer: the genre-standard workflow runs verbatim."""

import numpy as np

from tpucap import compat
from tpucap.data import generate_fixture_dataset


def test_reference_workflow(tmp_path, capsys):
    _, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=5
    )

    # The reference's prepare stage.
    doc = compat.load_doc(token_file)
    descriptions = compat.load_descriptions(doc)
    assert len(descriptions) == 6
    compat.clean_descriptions(descriptions)
    vocab = compat.to_vocabulary(descriptions)
    assert len(vocab) > 5
    clean_file = str(tmp_path / "descriptions.txt")
    compat.save_descriptions(descriptions, clean_file)

    train = compat.load_set(train_file)
    train_desc = compat.load_clean_descriptions(clean_file, train)
    assert set(train_desc) == train
    for caps in train_desc.values():
        assert all(
            c.startswith("startseq") and c.endswith("endseq") for c in caps
        )

    tokenizer = compat.create_tokenizer(train_desc)
    vocab_size = tokenizer.vocab_size
    max_len = compat.max_length(train_desc)

    rng = np.random.default_rng(0)
    photos = {
        i: rng.normal(size=(16,)).astype(np.float32) for i in train_desc
    }

    X1, X2, y = compat.create_sequences(
        tokenizer, max_len, train_desc, photos
    )
    assert X1.shape[0] == X2.shape[0] == y.shape[0]
    assert X2.shape[1] == max_len
    assert y.shape[1] == vocab_size

    model = compat.define_model(vocab_size, max_len, feature_dim=16)

    photo = photos[next(iter(train_desc))]
    cap_g = compat.generate_desc(model, tokenizer, photo, max_len)
    cap_b = compat.beam_search_desc(model, tokenizer, photo, max_len, 3)
    assert cap_g.startswith("startseq")
    assert cap_b.startswith("startseq")

    scores = compat.evaluate_model(
        model, train_desc, photos, tokenizer, max_len
    )
    out = capsys.readouterr().out
    assert "BLEU-4" in out
    assert set(scores) == {"bleu1", "bleu2", "bleu3", "bleu4"}

    assert compat.word_for_id(1, tokenizer) is not None
    assert compat.word_for_id(0, tokenizer) is None
