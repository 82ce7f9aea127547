from .field import DNGPRadianceField, NGPDensityField, contract_to_unisphere  # noqa: F401
