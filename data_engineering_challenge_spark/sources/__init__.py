"""Source readers: parquet, messy CSV kit, Excel bridge, sniffers."""
