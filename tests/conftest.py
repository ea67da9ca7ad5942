import pytest


@pytest.fixture(scope='session')
def spark():
    from ocrodjvu_spark.session import get_spark
    spark = get_spark('tests', cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel('ERROR')
    yield spark
