"""Sources: lake catalog (ADLS Gen2 / Hadoop FileSystem) + multimodal binary."""
