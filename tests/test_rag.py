"""RAG chunkers/embedders — analog of the reference's rag plugin coverage."""

import numpy as np

from alayalite_tpu.rag import (FixedSizeChunker, HashingEmbedding,
                               SemanticChunker, SentenceChunker, get_chunker,
                               get_embedder)


def test_fixed_size_chunker_overlap():
    c = FixedSizeChunker(chunk_size=10, overlap=4)
    chunks = c.chunk("abcdefghijklmnopqrstuvwxyz")
    assert all(len(ch) <= 10 for ch in chunks)
    # consecutive chunks share the 4-char overlap
    assert chunks[0][-4:] == chunks[1][:4]
    # full coverage
    assert "".join(ch[:6] for ch in chunks).startswith("abcdef")


def test_sentence_chunker_packs():
    text = "One. Two! Three? Four."
    c = SentenceChunker(max_chars=12)
    chunks = c.chunk(text)
    assert len(chunks) >= 2
    assert all(len(ch) <= 12 for ch in chunks)
    assert " ".join(chunks).replace("  ", " ").count("One") == 1


def test_semantic_chunker_merges_similar():
    emb = HashingEmbedding(dim=64)
    c = SemanticChunker(embed=emb.embed, similarity_threshold=0.5)
    text = ("the cat sat on the mat. the cat sat on a mat. "
            "quantum chromodynamics is a gauge theory.")
    chunks = c.chunk(text)
    assert 1 <= len(chunks) <= 3
    # the two near-identical cat sentences end up in one chunk
    assert sum("cat" in ch for ch in chunks) == 1


def test_hashing_embedding_properties():
    e = HashingEmbedding(dim=128)
    v = e.embed(["hello world", "hello world", "completely different text"])
    assert v.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(v[0], v[1])
    assert v[0] @ v[2] < 0.9


def test_factories():
    assert isinstance(get_chunker("sentence"), SentenceChunker)
    assert isinstance(get_embedder("hashing"), HashingEmbedding)


def test_rag_end_to_end():
    """chunk → embed → Collection insert → retrieve the right chunk."""
    import uuid

    from alayalite_tpu import Collection, IndexParams

    emb = HashingEmbedding(dim=128)
    chunks = SentenceChunker(max_chars=60).chunk(
        "The eiffel tower is in paris. Bananas are yellow fruit. "
        "Jax compiles numpy-like programs to TPUs.")
    vecs = emb.embed(chunks)
    col = Collection("rag", IndexParams(index_type="flat", capacity=64,
                                        metric="cos"))
    col.insert([(str(uuid.uuid4()), c, vecs[i], {})
                for i, c in enumerate(chunks)])
    q = emb.embed(["where is the eiffel tower?"])
    res = col.batch_query(q, limit=1, ef_search=8)
    assert "eiffel" in res["document"][0][0].lower()
