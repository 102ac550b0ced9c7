"""JAX SIFT math agrees with the float64 NumPy oracle (CPU, f32 tolerance)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sift4g_tpu.sift import scores as S
from sift4g_tpu.sift import scores_jax as SJ

X = ord("X") - ord("A")


def _random_alignment(rng, n, L):
    rows = rng.integers(0, 26, size=(n, L)).astype(np.uint8)
    # sprinkle X padding like real query-framed alignment strings
    mask = rng.random((n, L)) < 0.25
    rows[mask] = X
    rows[0] = rng.integers(0, 20, size=L)  # query row: standard letters
    return rows


@pytest.mark.parametrize("shape", [(5, 40), (40, 120), (2, 8)])
def test_sift_scores_jax_close_to_oracle(shape):
    rng = np.random.default_rng(9)
    rows = _random_alignment(rng, *shape)
    raw, _ = S.create_matrix(rows, np.ones(rows.shape[0]))

    want, w_weights, w_ndiff = S.calc_sift_scores(rows, raw)
    got, g_weights, g_ndiff = SJ.calc_sift_scores_jit(
        rows.astype(np.int32), raw.astype(np.float32)
    )
    np.testing.assert_array_equal(np.asarray(g_ndiff), w_ndiff)
    np.testing.assert_allclose(np.asarray(g_weights), w_weights, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_sift_scores_batch_vmap():
    rng = np.random.default_rng(11)
    q, n, L = 3, 10, 30
    rows = np.stack([_random_alignment(rng, n, L) for _ in range(q)])
    raws = np.stack(
        [S.create_matrix(rows[i], np.ones(n))[0] for i in range(q)]
    ).astype(np.float32)
    got, _, _ = SJ.calc_sift_scores_batch(rows.astype(np.int32), raws)
    for i in range(q):
        want, _, _ = S.calc_sift_scores(rows[i], raws[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=2e-3, atol=2e-4)


def test_sift_scores_from_rows_padding_invariant():
    """Padded all-'X' rows + padded positions with n_valid reproduce the
    unpadded result exactly (padding must be inert, scores_jax.py)."""
    rng = np.random.default_rng(13)
    n, L = 7, 50
    rows = _random_alignment(rng, n, L)

    base = np.asarray(
        SJ.sift_scores_from_rows(rows.astype(np.int32), np.int32(n))
    )

    n_pad, L_pad = 16, 128
    packed = np.full((n_pad, L_pad), X, dtype=np.int32)
    packed[:n, :L] = rows
    padded = np.asarray(
        SJ.sift_scores_from_rows(packed, np.int32(n))
    )
    np.testing.assert_allclose(padded[:L], base, rtol=1e-5, atol=1e-6)


def test_predict_matrix_batch_matches_host_oracle(tmp_path):
    """Device-batched matrix-mode prediction writes files whose parsed
    values agree with the host float64 oracle path to one printed-digit
    tolerance (sift/predict_batch.py)."""
    from sift4g_tpu.core.chain import Chain
    from sift4g_tpu.sift.predict import predict_query, prepare_rows
    from sift4g_tpu.sift.predict_batch import predict_matrix_batch

    rng = np.random.default_rng(17)
    host_dir = tmp_path / "host"
    dev_dir = tmp_path / "dev"
    host_dir.mkdir()
    dev_dir.mkdir()

    queries, prepared = [], []
    for qi, (n, L) in enumerate([(6, 37), (12, 61), (3, 37), (30, 200)]):
        rows = _random_alignment(rng, n, L)
        letters = (rows[0] % 20 + ord("A")).astype(np.uint8).tobytes().decode()
        q = Chain.from_string(f"q{qi}", letters)
        names = [f"t{j}" for j in range(n - 1)]
        predict_query(q, list(names), rows[1:], str(tmp_path / "nosubst"),
                      100, str(host_dir))
        queries.append(q)
        prepared.append(prepare_rows(q, list(names), rows[1:], 100))

    predict_matrix_batch(queries, prepared, str(dev_dir), q_chunk=3)

    def parse(path):
        vals = []
        with open(path) as fp:
            for line in fp:
                parts = line.split()
                if parts and parts[0] not in ("ID", "AC", "DE", "MA", "//") \
                        and not parts[0].isalpha():
                    vals.append([float(x) for x in parts])
        return np.asarray(vals)

    for q in queries:
        want = parse(host_dir / f"{q.name}.SIFTprediction")
        got = parse(dev_dir / f"{q.name}.SIFTprediction")
        assert want.shape == got.shape
        np.testing.assert_allclose(got, want, atol=1.5e-4)


def test_bucket_shapes():
    from sift4g_tpu.sift.predict_batch import bucket_shapes

    b = bucket_shapes([37, 61, 37, 200], [6, 12, 3, 30])
    assert b == {(128, 64): [0, 1, 2], (256, 64): [3]}


def test_predict_batch_depth_invariance(tmp_path, monkeypatch):
    """The software-pipeline depth (launches in flight) must not change a
    byte of output — DEPTH=1 (round-4 behaviour) vs DEPTH=3 (beyond the
    default 2) produce identical files."""
    import filecmp
    import os

    from sift4g_tpu.core.chain import Chain
    from sift4g_tpu.sift import predict_batch
    from sift4g_tpu.sift.predict import prepare_rows
    from sift4g_tpu.sift.predict_batch import predict_matrix_batch

    rng = np.random.default_rng(23)
    queries, prepared = [], []
    for qi, (n, L) in enumerate([(6, 37), (12, 61), (3, 37), (8, 61), (5, 37)]):
        rows = _random_alignment(rng, n, L)
        letters = (rows[0] % 20 + ord("A")).astype(np.uint8).tobytes().decode()
        q = Chain.from_string(f"q{qi}", letters)
        names = [f"t{j}" for j in range(n - 1)]
        queries.append(q)
        prepared.append(prepare_rows(q, list(names), rows[1:], 100))

    outs = {}
    for depth in (1, 3):
        out = tmp_path / f"d{depth}"
        out.mkdir()
        monkeypatch.setattr(predict_batch, "DEPTH", depth)
        predict_matrix_batch(queries, prepared, str(out), q_chunk=2)
        outs[depth] = out
    names = sorted(os.listdir(outs[1]))
    assert len(names) == 5 and names == sorted(os.listdir(outs[3]))
    for name in names:
        assert filecmp.cmp(outs[1] / name, outs[3] / name, shallow=False)


def test_long_queries_route_to_host_oracle(tmp_path, monkeypatch):
    """Queries beyond MAX_DEVICE_QUERY_LEN stay on the float64 host path
    under --predict-backend device (the device one-hot intermediate
    scales linearly in L); outputs are the oracle's bytes."""
    import filecmp
    import os

    from sift4g_tpu.pipeline import PipelineConfig, run_pipeline
    from sift4g_tpu.sift import predict_batch

    monkeypatch.setattr(predict_batch, "MAX_DEVICE_QUERY_LEN", 100)
    rng = np.random.default_rng(9)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    # one short (device) + one "long" (host-routed under the tiny cap)
    qs = {
        "SHORT": "".join(rng.choice(list(aas), 60)),
        "LONG": "".join(rng.choice(list(aas), 240)),
    }
    with open(tmp_path / "q.fa", "w") as fh:
        for n, s in qs.items():
            fh.write(f">{n}\n{s}\n")
    with open(tmp_path / "db.fa", "w") as fh:
        for i in range(40):
            fh.write(f">t{i}\n{''.join(rng.choice(list(aas), 150))}\n")
        for n, s in qs.items():  # exact homologs pass the E-value filter
            fh.write(f">h_{n}\n{s}\n")

    outs = {}
    for be in ("host", "device"):
        out = tmp_path / be
        out.mkdir()
        cfg = PipelineConfig(
            query_path=str(tmp_path / "q.fa"),
            database_path=str(tmp_path / "db.fa"),
            out_path=str(out),
            align_backend="numpy",
            predict_backend=be,
            log=open(os.devnull, "w"),
        )
        run_pipeline(cfg)
        outs[be] = out
    # the long query's file is byte-identical (host path both times);
    # both queries produced output either way
    assert (outs["device"] / "SHORT.SIFTprediction").exists()
    assert filecmp.cmp(
        outs["host"] / "LONG.SIFTprediction",
        outs["device"] / "LONG.SIFTprediction",
        shallow=False,
    )
