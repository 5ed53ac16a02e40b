from .ingest import stream_offers_to_lake, windowed_offer_counts

__all__ = ["stream_offers_to_lake", "windowed_offer_counts"]
