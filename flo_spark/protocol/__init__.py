"""flo TCP wire protocol — message codec, embedded server, and remote
client (the reference's flo-protocol + flo-server network surface)."""
