from .logmmexp import logmmexp, chain_logmmexp
