from ovalspark.datagen.generator import (  # noqa: F401
    GenSpec,
    catalog_from_flat,
    generate_assets,
    generate_catalog,
    generate_documents,
    generate_documents_flat,
)
from ovalspark.datagen.corrupt import FAULT_CLASSES, inject_faults  # noqa: F401
