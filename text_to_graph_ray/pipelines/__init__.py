"""End-to-end pipeline compositions over Ray Data Datasets."""
