from .cooler import CoolerWriter, CoolerReader, write_cooler, list_resolutions
