from uig.data.datasets import FolderDataset, PackedDataset, SyntheticUnpairedDataset
from uig.data.pipeline import UnpairedPipeline, make_input_pipeline


def eval_datasets(cfg):
    """(domain_a, domain_b) index-addressable datasets for eval paths
    (sample grids, FID) — same source resolution as the train pipeline."""
    d = cfg.data
    if d.source == "folders":
        return (FolderDataset(d.dir_a, d.load_size),
                FolderDataset(d.dir_b, d.load_size))
    if d.source == "packed":
        return (PackedDataset(d.dir_a, d.load_size),
                PackedDataset(d.dir_b, d.load_size))
    if d.source == "tfrecord":
        from uig.data.datasets import TFRecordImageDataset

        return (TFRecordImageDataset(d.dir_a, d.load_size),
                TFRecordImageDataset(d.dir_b, d.load_size))
    if d.source == "webdataset":
        from uig.data.datasets import WebDatasetImageDataset

        return (WebDatasetImageDataset(d.dir_a, d.load_size),
                WebDatasetImageDataset(d.dir_b, d.load_size))
    syn = SyntheticUnpairedDataset(d.synthetic_len, d.load_size, d.shuffle_seed)
    return syn.domain_a, syn.domain_b


def multidomain_eval_datasets(cfg):
    """One index-addressable dataset per domain for StarGAN eval paths
    (sample grids, FID) — same source resolution as the train pipeline."""
    d = cfg.data
    if d.source == "synthetic":
        from uig.data.datasets import SyntheticMultiDomainDataset

        return SyntheticMultiDomainDataset(
            cfg.model.num_domains, d.synthetic_len, d.load_size,
            d.shuffle_seed).domains
    from uig.data.datasets import resolve_dataset

    return [resolve_dataset(p, d.load_size) for p in d.domain_dirs]


__all__ = [
    "FolderDataset",
    "PackedDataset",
    "SyntheticUnpairedDataset",
    "UnpairedPipeline",
    "make_input_pipeline",
    "eval_datasets",
]
