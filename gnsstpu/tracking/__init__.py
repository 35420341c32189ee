from gnsstpu.tracking.driver import track, TrackResults, ChannelInit  # noqa: F401
