"""Example-script smoke tests: every L5 demo runs end-to-end on small
problems, and the core-solver doctest pin (reference
examples/core_solver.py:67-70 — "6 converged eigenvalues [1..6]") is
enforced by the suite, mirroring the reference's doctest-regression
strategy (SURVEY §4)."""

import doctest

import numpy as np


def test_core_solver_doctest_pin():
    from raleigh_tpu.examples import core_solver

    results = doctest.testmod(core_solver)
    assert results.attempted >= 1
    assert results.failed == 0


def test_eigenimages_interactive_probe(monkeypatch, tmp_path):
    """The eigenimages ImageProbe drives an interactive run: help, image
    inspection, tolerance handover and quit, via monkeypatched stdin
    (reference icompute_eigenimages.py:63-186 Probe workflow)."""
    import os
    from raleigh_tpu.examples.eigenimages import ImageProbe
    from raleigh_tpu.interfaces.truncated_svd import UserStoppingCriteria
    from raleigh_tpu.interfaces.pca import pca
    from raleigh_tpu.core.solver import Options
    from raleigh_tpu.examples.generate_matrix import generate

    np.random.seed(1)
    data, *_ = generate(300, 200, 100, pca=True)
    images = data.reshape(300, 20, 10)    # image-shaped samples

    answers = iter(['h', 's 0 3', '', 't 0.25', 'q'])
    monkeypatch.setattr('builtins.input', lambda msg: next(answers, 'q'))
    monkeypatch.chdir(tmp_path)           # probe saves pairs headlessly

    probe = ImageProbe(images)
    opt = Options()
    opt.block_size = 16
    opt.stopping_criteria = UserStoppingCriteria(
        data, shift=True, probe=probe)
    mean, trans, comps = pca(data, opt=opt, method='jacobi')
    assert comps.shape[0] >= 16
    # 't 0.25' kept it running until the error fell below 0.25
    assert probe.errors[-1][1] < 0.25
    # the 's 0 3' command rendered (headless: persisted) two image pairs
    assert os.path.exists('probe_image_0.npy')
    assert os.path.exists('probe_approx_3.npy')


def test_eigenimages_show_errors(tmp_path, capsys):
    """show_errors reports per-image PCA error statistics from the saved
    npz (reference examples/eigenimages/show_errors.py capability)."""
    from raleigh_tpu.examples.eigenimages import show_errors
    from raleigh_tpu.interfaces.pca import pca
    from raleigh_tpu.examples.generate_matrix import generate

    np.random.seed(1)
    data, *_ = generate(300, 200, 100, pca=True)
    mean, trans, comps = pca(data, npc=40)
    npz = tmp_path / 'ei.npz'
    np.savez(npz, mean=mean, trans=trans, comps=comps)
    errs = show_errors(data, str(npz), plot=False)
    assert errs.shape == (300,)
    assert np.median(errs) < 0.5
    out = capsys.readouterr().out
    assert 'per-image relative errors' in out


def test_sparse_evp_example():
    from raleigh_tpu.examples import sparse_evp

    _, _, vals = sparse_evp.run(nev=4, sigma=0.0, tol=1e-6,
                                compare_eigsh=False,
                                lap_dims=(10, 10, 10, 1.0, 1.01, 1.02))
    from raleigh_tpu.examples.laplace import lap3d
    import scipy.sparse.linalg as spl
    a = lap3d(10, 10, 10, 1.0, 1.01, 1.02)
    ref = spl.eigsh(a, k=4, sigma=0.0, which='LM')[0]
    got = np.sort(np.asarray(vals).ravel())[:4]
    assert np.allclose(got, np.sort(ref), rtol=1e-6)


def test_truncated_svd_demo():
    from raleigh_tpu.examples import truncated_svd_demo

    truncated_svd_demo.run(m=200, n=120, rank=40, nsv=10, arch='cpu')


def test_pca_demo_modes():
    from raleigh_tpu.examples import pca_demo

    for mode in ('simple', 'tol', 'update', 'incremental'):
        pca_demo.run(mode=mode, m=300, n=200, rank=80, npc=20, arch='cpu')


def test_pca_update_past_full_rank():
    """pca(have=) when the existing basis already spans the feature
    space: the merged basis must be capped at the dimension (the
    mean-shift direction and new components have no out-of-span part),
    not overflow into an overcomplete block."""
    from raleigh_tpu import pca, pca_error

    rng = np.random.RandomState(7)
    A = (rng.standard_normal((300, 200))
         @ np.diag(np.arange(1, 201.0) ** -0.7)
         @ rng.standard_normal((200, 200)))
    mean, trans, comps = pca(A[:240], tol=0.05)
    mean, trans, comps = pca(A[240:], have=(mean, trans, comps), tol=0.05)
    assert comps.shape[0] <= 200
    _, ef = pca_error(A, mean, trans, comps)
    assert ef < 0.06
    g = comps @ comps.conj().T
    assert np.abs(g - np.eye(len(g))).max() < 1e-8


def _write_synthetic_faces(root, npeople=3, per_person=2, h=25, w=20):
    """Tiny LFW-style tree: per-person folders of RGB images with a
    bright centered 'face' blob on a textured background."""
    from PIL import Image

    rng = np.random.RandomState(7)
    y, x = np.mgrid[:h, :w]
    for p in range(npeople):
        d = root / ('person_%d' % p)
        d.mkdir()
        for i in range(per_person):
            blob = 200.0 * np.exp(-(((x - w / 2 - p) / (w / 4)) ** 2
                                    + ((y - h / 2) / (h / 3)) ** 2))
            img = blob + 40.0 * rng.rand(h, w)
            rgb = np.stack([img, img, img], axis=-1).astype(np.uint8)
            Image.fromarray(rgb).save(str(d / ('%04d.png' % i)))
    return npeople * per_person


def test_convert_images_pipeline(tmp_path):
    """The LFW-converter equivalent (reference convert_lfw.py:4-80) on
    synthetic images: grayscale + passport crop, off-face masking,
    mirror doubling, and symmetry selection semantics."""
    from raleigh_tpu.examples import convert_images as ci

    n = _write_synthetic_faces(tmp_path)
    images, names = ci.convert_images(str(tmp_path), double=True,
                                      off_face=0.0)
    assert images.shape[0] == 2 * n and images.dtype == np.float32
    # passport crop: central 90% x 70% of the 25x20 originals
    assert images.shape[1:] == (int(25 * 0.9), int(20 * 0.7))
    # mirror interleave: odd entries are the flipped even ones
    assert np.array_equal(images[1], images[0][:, ::-1])
    assert names[0] == names[1] == 'person_0'
    # off_face=0.0 erases the background to the stack minimum
    mask = ci.face_mask(*images.shape[1:])
    assert np.all(images[0][mask] == images.min())
    # asymmetry of a mirror pair is identical; selection keeps the most
    # symmetric images first
    a = ci.asymmetry(images)
    assert np.allclose(a[0::2], a[1::2])
    keep = ci.select_symmetric(images, 4.0)       # 4 most symmetric
    assert len(keep) == 4
    keep_all = ci.select_symmetric(images, 1.0 - 1e-12)
    assert len(keep_all) >= len(keep)


def test_convert_images_cli(tmp_path, monkeypatch):
    """End-to-end CLI: writes images.npy/names.txt (+ photos.npy on
    asymmetry selection) consumable by examples/eigenimages.py."""
    from raleigh_tpu.examples import convert_images as ci

    n = _write_synthetic_faces(tmp_path, npeople=2, per_person=2)
    out = tmp_path / 'out'
    out.mkdir()
    monkeypatch.chdir(out)
    rc = ci.main([str(tmp_path), '-o', 'images.npy', '-f', '0.5',
                  '-s', '-2.0', '-m', '3'])
    assert rc == 0
    images = np.load('images.npy')
    assert images.shape[0] == 3                   # -m 3 honored
    with open('names.txt') as f:
        assert len(f.read().split()) == 3
    photos = np.load('photos.npy')
    assert 1 <= photos.shape[0] <= 3
