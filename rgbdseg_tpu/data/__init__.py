"""Input pipeline: meta-JSON datasets, preprocessing, versioned channel builders,
fixed-shape padded batching."""
