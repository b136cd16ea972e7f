from .chromsizes import read_chromsizes, sort_chromlabels
from .coolerlite import CoolerLite, create_cooler_file
from .peakfile import parse_peakfile, find_chrom_pre
