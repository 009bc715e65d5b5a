from gltvae.data.pipeline import ArrayDataset, BatchLoader
from gltvae.data.synthetic import synthetic_celeba
from gltvae.data.celeba import CelebAReader, load_attr_csv
