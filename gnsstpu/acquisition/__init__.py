from gnsstpu.acquisition.search import acquire, AcqResults  # noqa: F401
