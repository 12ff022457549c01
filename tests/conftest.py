import pytest

from gaia_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gaia_tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from gaia_synth import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), 120)
    return str(d)


@pytest.fixture(scope="session")
def oracle_result():
    from gaia_ref.oracle import run_oracle
    from gaia_synth import gen_pages

    return run_oracle(gen_pages(120))
