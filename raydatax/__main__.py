"""``python -m raydatax`` — the submittable driver entrypoint.

On a real cluster this is what ``ray job submit`` runs::

    ray job submit --working-dir . -- python -m raydatax \
        --wal /data/wal --lake /data/lake --partitions 256

(the module connects to the cluster Ray instance; locally it starts one).
"""

from .driver import main

if __name__ == "__main__":
    raise SystemExit(main())
