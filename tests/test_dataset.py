"""Dataset tests: dir/zip loading, labels, depth decode, xflip mirroring,
embeddings memmap, InfiniteSampler semantics (SURVEY.md §2.1 dataset row)."""
import json
import os
import zipfile

import numpy as np
import PIL.Image
import pytest

from tdgp.data.dataset import (BatchLoader, ImageFolderDataset, InfiniteSampler,
                               normalize_batch)


@pytest.fixture(scope='module')
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('data') / 'toy'
    os.makedirs(root)
    rng = np.random.RandomState(0)
    labels = {}
    cameras = {}
    n = 6
    for i in range(n):
        name = f'img{i:03d}.png'
        arr = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(root / name)
        depth = rng.randint(0, 65535, (16, 16), dtype=np.uint16)
        PIL.Image.fromarray(depth, mode='I;16').save(root / f'img{i:03d}_depth.png')
        labels[name] = i % 3
        cameras[name] = [0.3 * i, 1.5, 0.0]
    with open(root / 'dataset.json', 'w') as f:
        json.dump({'labels': labels, 'camera_angles': cameras}, f)
    # embeddings memmap
    emb_dir = tmp_path_factory.mktemp('embs')
    embs = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    mm = np.memmap(emb_dir / 'e.memmap', dtype='float32', mode='w+', shape=(n, 4))
    mm[:] = embs
    mm.flush()
    with open(emb_dir / 'e_desc.json', 'w') as f:
        json.dump({'shape': [n, 4],
                   'filepath_to_idx': {f'img{i:03d}.png': i for i in range(n)}}, f)
    return str(root), str(emb_dir / 'e.memmap'), str(emb_dir / 'e_desc.json')


def test_dir_dataset_basic(dataset_dir):
    root, mm, desc = dataset_dir
    ds = ImageFolderDataset(root, resolution=16, use_labels=True, use_depth=True,
                            use_embeddings=True, embeddings_path=mm,
                            embeddings_desc_path=desc)
    assert len(ds) == 6
    assert ds.label_dim == 3
    item = ds[0]
    assert item['image'].shape == (16, 16, 3) and item['image'].dtype == np.uint8
    assert item['label'].shape == (3,) and item['label'].sum() == 1
    assert item['depth'].shape == (16, 16, 1) and item['depth'].dtype == np.int32
    assert item['camera_angles'].shape == (3,)
    np.testing.assert_allclose(item['embedding'], [0, 1, 2, 3])


def test_mirror_doubles_and_flips(dataset_dir):
    root, mm, desc = dataset_dir
    ds = ImageFolderDataset(root, use_labels=True, use_depth=True, mirror=True,
                            mean_yaw=0.0)
    assert len(ds) == 12
    a, b = ds[0], ds[6]
    np.testing.assert_array_equal(a['image'][:, ::-1], b['image'])
    np.testing.assert_array_equal(a['depth'][:, ::-1], b['depth'])
    # yaw mirrored around mean (ref dataset.py:157-163)
    assert b['camera_angles'][0] == -a['camera_angles'][0]


def test_zip_dataset_equivalent(dataset_dir, tmp_path):
    root, _, _ = dataset_dir
    zip_path = str(tmp_path / 'toy.zip')
    with zipfile.ZipFile(zip_path, 'w') as zf:
        for f in sorted(os.listdir(root)):
            zf.write(os.path.join(root, f), f)
    ds_dir = ImageFolderDataset(root, use_labels=True, use_depth=True)
    ds_zip = ImageFolderDataset(zip_path, use_labels=True, use_depth=True)
    assert len(ds_dir) == len(ds_zip)
    np.testing.assert_array_equal(ds_dir[2]['image'], ds_zip[2]['image'])
    np.testing.assert_array_equal(ds_dir[2]['depth'], ds_zip[2]['depth'])


def test_8bit_depth_scaled(tmp_path):
    root = tmp_path / 'zoe'
    os.makedirs(root)
    PIL.Image.fromarray(np.full((8, 8, 3), 100, np.uint8)).save(root / 'a.png')
    PIL.Image.fromarray(np.full((8, 8), 7, np.uint8), mode='L').save(root / 'a_depth.png')
    ds = ImageFolderDataset(str(root), use_depth=True)
    assert ds[0]['depth'][0, 0, 0] == 7 * 256  # 8-bit ZoeDepth x256 (ref :326)


def test_infinite_sampler_rank_striding():
    full = InfiniteSampler(10, rank=0, num_replicas=1, seed=1)
    it = iter(full)
    first_100 = [next(it) for _ in range(100)]
    # window shuffling permits short-range repeats, but the stream must cover
    # everything and stay roughly uniform
    counts = np.bincount(first_100, minlength=10)
    assert counts.min() >= 5 and counts.max() <= 15

    r0 = iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=1))
    r1 = iter(InfiniteSampler(10, rank=1, num_replicas=2, seed=1))
    a = [next(r0) for _ in range(10)]
    b = [next(r1) for _ in range(10)]
    # the two ranks interleave one global stream: no shared positions
    base = iter(InfiniteSampler(10, rank=0, num_replicas=1, seed=1))
    stream = [next(base) for _ in range(20)]
    assert a == stream[0::2]
    assert b == stream[1::2]


def test_batch_loader_and_normalize(dataset_dir):
    root, mm, desc = dataset_dir
    ds = ImageFolderDataset(root, use_labels=True, use_depth=True,
                            use_embeddings=True, embeddings_path=mm,
                            embeddings_desc_path=desc)
    loader = BatchLoader(ds, batch_size=4, num_threads=1, prefetch=2)
    batch = next(loader)
    loader.close()
    assert batch['image'].shape == (4, 16, 16, 3)
    norm = normalize_batch(batch)
    assert norm['img'].min() >= -1.0 and norm['img'].max() <= 1.0
    assert norm['depth'].min() >= -1.0 and norm['depth'].max() <= 1.0
    assert norm['c'].shape == (4, 3)
