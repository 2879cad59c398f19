from ovalspark.datagen.generator import GenSpec, catalog_from_flat, generate_assets, generate_catalog, generate_documents  # noqa: F401
from ovalspark.datagen.corrupt import FAULT_CLASSES, inject_faults  # noqa: F401
