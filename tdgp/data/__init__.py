from tdgp.data.dataset import ImageFolderDataset, InfiniteSampler, BatchLoader
